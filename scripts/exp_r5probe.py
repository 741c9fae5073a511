"""Round-4b probe: warm 2^13 fused prover timing under current tunnel
conditions, with a real RTT floor measurement (fresh 1-element fetch
per sample — a cached np.asarray of a committed array returns 0)."""
import json, os, resource, sys, time
try:
    s, h = resource.getrlimit(resource.RLIMIT_STACK)
    w = 256 * 1024 * 1024
    if s != resource.RLIM_INFINITY and s < w:
        resource.setrlimit(resource.RLIMIT_STACK, (
            w if h == resource.RLIM_INFINITY else min(w, h), h))
except Exception:
    pass
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import starks_tpu.prover as tp

CONSTANTS = [(i ** 7) ^ 42 for i in range(64)]
_add1 = jax.jit(lambda x, y: x + y)


def rtt_ms(n=5):
    x = jnp.zeros((1,), jnp.uint32)
    ts = []
    for i in range(n + 1):
        y = _add1(x, jnp.uint32(i))
        jax.block_until_ready(y)       # may no-op on axon
        t0 = time.perf_counter()
        np.asarray(y)
        ts.append(time.perf_counter() - t0)
    return min(ts[1:]) * 1e3


t0 = time.time()
proof = tp.mk_mimc_proof(3, 8192, CONSTANTS)
warm = time.time() - t0
out = {"warmup_s": warm, "rtt_ms_before": rtt_ms(), "iters": []}
for _ in range(10):
    t0 = time.time()
    tp.mk_mimc_proof(3, 8192, CONSTANTS)
    dt = time.time() - t0
    out["iters"].append({"prove_ms": dt * 1e3,
                         "stages": {k: v * 1e3 for k, v in
                                    tp.LAST_PROOF_TIMINGS.items()}})
out["rtt_ms_after"] = rtt_ms()
with open("/root/repo/scripts/exp_r5probe.json", "w") as fh:
    json.dump(out, fh, indent=1)
print("rtt", round(out["rtt_ms_before"], 2), round(out["rtt_ms_after"], 2))
for it in out["iters"]:
    print(round(it["prove_ms"], 1))
