"""Round-4b: per-section D2H arrival timeline for the fused 2^13 prove.

Measures, for each warm prove iteration:
  - t_dispatch: core dispatch return
  - per-section arrival time (device_get completion, relative to
    dispatch) and size
  - total prove wall

Separates the three suspects for prove-time variance on the tunneled
runtime: ambient RTT (1-element fetch floor), aggregate D2H bandwidth
(payload/stream rate), and device compute (first-arrival minus RTT).
"""
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
from starks_tpu.config import REFERENCE

CONSTANTS = [(i ** 7) ^ 42 for i in range(64)]
STEPS = 8192


def rtt_ms():
    x = jnp.zeros((1,), jnp.uint32)
    np.asarray(x)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(x)
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    from starks_tpu.models import mimc as mimc_model
    su = tp._FusedSetup.get(STEPS, REFERENCE)
    plan = su.plan
    trace = np.asarray(mimc_model.trace_limbs(3, STEPS, CONSTANTS))
    k_ext = su.k_ext_limbs(CONSTANTS)
    cs_expand = su.expand_consts(CONSTANTS)
    core = su.traced_core()

    # warm
    ck = jnp.asarray(tp._trace_ckpts_packed(trace, su))
    parts = core(ck, cs_expand, k_ext, su.zni8, su.h_pows, su.islope_l,
                 su.last_l, su.one_l, plan.xs_big, plan.tw_inv_small,
                 plan.n_inv_small, plan.tw_fwd_big, plan.fri_inv_pows,
                 su.eta_l, su.inv4_l, su.inv_z2)
    for p in parts:
        np.asarray(p)

    out = {"rtt_ms": rtt_ms(), "sections": [], "iters": []}
    names = [n for n, _ in su.sections]
    big = getattr(su, "big_sections", None)
    if big is not None:            # pre-round-4b per-section layout
        labels = [big[k][1] for k in range(len(big))] + ["small_pack"]
    else:                          # round-4b balanced-chunk layout
        labels = [f"chunk{k}" for k in range(su.n_chunks)]

    import concurrent.futures as cf
    pool = cf.ThreadPoolExecutor(16)

    for it in range(8):
        ck = jnp.asarray(tp._trace_ckpts_packed(trace, su))
        t0 = time.perf_counter()
        parts = core(ck, cs_expand, k_ext, su.zni8, su.h_pows,
                     su.islope_l, su.last_l, su.one_l, plan.xs_big,
                     plan.tw_inv_small, plan.n_inv_small,
                     plan.tw_fwd_big, plan.fri_inv_pows, su.eta_l,
                     su.inv4_l, su.inv_z2)
        t_disp = time.perf_counter() - t0
        for p in parts:
            try:
                p.copy_to_host_async()
            except Exception:
                pass

        arrivals = [None] * len(parts)
        sizes = [None] * len(parts)

        def work(i):
            a = np.asarray(jax.device_get(parts[i]))
            arrivals[i] = time.perf_counter() - t0
            sizes[i] = a.nbytes

        futs = [pool.submit(work, i) for i in range(len(parts))]
        for f in futs:
            f.result()
        total = time.perf_counter() - t0
        out["iters"].append({
            "dispatch_ms": t_disp * 1e3,
            "total_ms": total * 1e3,
            "arrivals_ms": [round(a * 1e3, 2) for a in arrivals],
        })
        if it == 0:
            out["sections"] = [
                {"label": labels[i] if i < len(labels) else f"p{i}",
                 "bytes": sizes[i]} for i in range(len(parts))]
    out["rtt_ms_after"] = rtt_ms()
    with open("/root/repo/scripts/exp_r5timeline.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["iters"][-1]))
    print("rtt", out["rtt_ms"], out["rtt_ms_after"])


main()
