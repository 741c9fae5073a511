"""Round-4 opening measurement: where do the 58 ms of
"device compute + transfer" at 2^13 actually go?

Splits the fused prover's device time into
  (a) pure device compute      — force 1 element of the flat output
  (b) proof payload D2H        — np.asarray(flat) with compute done
  (c) the per-transfer floor
so round-4 optimization effort lands on the real bottleneck
(VERDICT r3 assumes ~34 ms is compute; BASELINE's 12-29 MB/s bulk rate
suggests the ~600 kB payload alone could be ~20-50 ms).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_axon"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from starks_tpu import prover
from starks_tpu.models import mimc as mimc_model
from starks_tpu.utils import timing

STEPS = 8192
CONSTS = [(i ** 7) ^ 42 for i in range(64)]
INP = 3

report = {}
floor = timing.transfer_floor()
report["floor_s"] = floor
print(f"transfer floor: {floor*1e3:.1f} ms", flush=True)

su = prover._FusedSetup.get(STEPS, prover.REFERENCE)
plan = su.plan
trace = np.asarray(mimc_model.trace_limbs(INP, STEPS, CONSTS))
k_ext = su.k_ext_limbs(CONSTS)
cs_expand = su.expand_consts(CONSTS)
ckpts = jnp.asarray(prover._trace_ckpts_packed(trace, su))
core = su.traced_core()

args = (ckpts, cs_expand, k_ext, su.zni8, su.h_pows, su.islope_l,
        su.last_l, su.one_l, plan.xs_big, plan.tw_inv_small,
        plan.n_inv_small, plan.tw_fwd_big, plan.fri_inv_pows, su.eta_l,
        su.inv4_l, su.inv_z2)

t0 = time.perf_counter()
flat = core(*args)
timing.force(flat)
print(f"warmup (compile): {time.perf_counter()-t0:.1f} s", flush=True)
report["flat_words"] = int(flat.shape[0])
report["flat_bytes"] = int(flat.shape[0]) * 4

# (a) compute + floor: rerun core, force one element only.
best = None
for _ in range(3):
    t0 = time.perf_counter()
    out = core(*args)
    timing.force(out)
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
report["compute_plus_floor_s"] = best
report["compute_s"] = best - floor
print(f"compute+floor: {best*1e3:.1f} ms -> compute ~{(best-floor)*1e3:.1f} ms",
      flush=True)

# (b) payload transfer alone: flat is materialized (forced above).
best = None
for _ in range(3):
    t0 = time.perf_counter()
    np.asarray(flat)
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
report["payload_fetch_s"] = best
report["payload_mb_per_s"] = report["flat_bytes"] / best / 1e6
print(f"payload fetch ({report['flat_bytes']/1e3:.0f} kB): {best*1e3:.1f} ms "
      f"= {report['payload_mb_per_s']:.1f} MB/s", flush=True)

# (c) end-to-end: core + full fetch (what the prover pays today).
best = None
for _ in range(3):
    t0 = time.perf_counter()
    out = core(*args)
    np.asarray(out)
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
report["end_to_end_s"] = best
print(f"end-to-end (compute + full fetch): {best*1e3:.1f} ms", flush=True)

# (d) does a second fetch of the SAME buffer cost the same? (cache?)
x = jnp.arange(2 ** 17, dtype=jnp.uint32)  # 512 kB
timing.force(x)
best = None
for _ in range(3):
    t0 = time.perf_counter()
    np.asarray(x)
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
report["raw_512kb_fetch_s"] = best
report["raw_mb_per_s"] = 2 ** 19 / best / 1e6
print(f"raw 512kB fetch: {best*1e3:.1f} ms = {report['raw_mb_per_s']:.1f} MB/s",
      flush=True)

# (e) chunked parallel fetch: split flat into 4 pieces fetched from 4
# threads — does the tunnel pipeline concurrent transfers?
import concurrent.futures as cf
n = int(flat.shape[0])
q = n // 4
parts = [flat[i * q:(i + 1) * q] for i in range(3)] + [flat[3 * q:]]
for p in parts:
    timing.force(p)
with cf.ThreadPoolExecutor(4) as pool:
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        list(pool.map(np.asarray, parts))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
report["parallel4_fetch_s"] = best
print(f"4-way parallel fetch: {best*1e3:.1f} ms", flush=True)

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "exp_r4split.json"), "w") as fh:
    json.dump(report, fh, indent=2)
print(json.dumps(report, indent=2))
