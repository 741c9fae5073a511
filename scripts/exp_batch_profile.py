"""Profile the batch prover's phase costs on chip: per-chunk dispatch /
trace-pack / fetch / decode, to locate the throughput bottleneck
(round-5; config5b showed 28 ms/proof and the suspicion is serial host
decode, not device time).

Usage: python scripts/exp_batch_profile.py [n_claims] [chunk] [log2_steps]
Writes scripts/exp_batch_profile.json.
"""
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".jax_cache_axon"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import starks_tpu.prover as tp
from starks_tpu.config import REFERENCE
from starks_tpu.models import mimc as mimc_model

n_claims = int(sys.argv[1]) if len(sys.argv) > 1 else 8
chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 4
log2 = int(sys.argv[3]) if len(sys.argv) > 3 else 13
steps = 2 ** log2
CONSTANTS = [(i ** 7) ^ 42 for i in range(64)]
inps = [3 + 2 * i for i in range(n_claims)]

su = tp._FusedSetup.get(steps, REFERENCE)
plan = su.plan
k_ext = su.k_ext_limbs(CONSTANTS)
cs_expand = su.expand_consts(CONSTANTS)
core = su.batch_traced_core()


def dispatch(part):
    t0 = time.perf_counter()
    ck = []
    for inp in part:
        t = mimc_model.trace_limbs(inp, steps, CONSTANTS)
        ck.append(tp._trace_ckpts_packed(np.asarray(t), su))
    ckpts = jnp.asarray(np.stack(ck))
    t1 = time.perf_counter()
    out = core(ckpts, cs_expand, k_ext, su.zni8, su.h_pows,
               su.islope_l, su.last_l, su.one_l, plan.xs_big,
               plan.tw_inv_small, plan.n_inv_small, plan.tw_fwd_big,
               plan.fri_inv_pows, su.eta_l, su.inv4_l, su.inv_z2)
    t2 = time.perf_counter()
    return out, t1 - t0, t2 - t1


# warm (compile or cache load)
t0 = time.time()
parts, _, _ = dispatch(inps[:chunk])
tp._fetch_parts_np(parts)
print(f"# warm: {time.time() - t0:.1f}s", file=sys.stderr)

chunks = [inps[lo:lo + chunk] for lo in range(0, n_claims, chunk)]
phases = []
t_all0 = time.perf_counter()
in_flight, tr_s, disp_s = dispatch(chunks[0])
for ci in range(len(chunks)):
    row = {"chunk": ci, "trace_pack_s": tr_s, "dispatch_s": disp_s}
    t0 = time.perf_counter()
    nxt = dispatch(chunks[ci + 1]) if ci + 1 < len(chunks) else None
    if nxt:
        _, tr_s, disp_s = nxt[1], nxt[1], nxt[2]
        nxt = nxt[0]
    row["next_dispatch_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    parts_np = tp._fetch_parts_np(in_flight)
    row["fetch_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    proofs = [tp._decode_fused([p[b] for p in parts_np], su)
              for b in range(len(chunks[ci]))]
    row["decode_s"] = time.perf_counter() - t0
    row["decode_per_proof_s"] = row["decode_s"] / len(chunks[ci])
    phases.append(row)
    in_flight = nxt
total = time.perf_counter() - t_all0

report = {"n_claims": n_claims, "chunk": chunk, "steps": steps,
          "total_s": total, "per_proof_s": total / n_claims,
          "phases": phases,
          "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
print(json.dumps(report, indent=2))
with open(os.path.join(_REPO, "scripts", "exp_batch_profile.json"),
          "w") as fh:
    json.dump(report, fh, indent=2)
