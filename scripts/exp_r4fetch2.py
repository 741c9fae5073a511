"""Round-4: fetch-strategy A/B test on the REAL tuple-output core.

The per-section refactor regressed e2e 52.5 -> 125 ms; suspicion: the
copy_to_host_async pre-loop costs a round trip per buffer. Compare on
fresh dispatches of the real 2^13 core (cache-hit compile):
  A. jax.device_get(parts)            (one call on the whole tuple)
  B. 16-thread device_get, no pre-async
  C. 16-thread np.asarray, no pre-async
  D. current _fetch_prepped           (pre-async + threads + decode)
  E. B + per-section decode in the workers
"""

import json
import os
import sys
import time
import concurrent.futures as cf

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

STEPS = 8192
CONSTS = [(i ** 7) ^ 42 for i in range(64)]
INP = 3

report = {}
su = prover._FusedSetup.get(STEPS, prover.REFERENCE)
plan = su.plan
trace = np.asarray(mimc_model.trace_limbs(INP, STEPS, CONSTS))
k_ext = su.k_ext_limbs(CONSTS)
cs_expand = su.expand_consts(CONSTS)
ckpts0 = prover._trace_ckpts_packed(trace, su)
core = su.traced_core()

def dispatch(salt=0):
    ck = ckpts0.copy()
    ck[0, 0] ^= 0            # keep values identical; fresh upload
    ckpts = jnp.asarray(ck)
    return core(ckpts, cs_expand, k_ext, su.zni8, su.h_pows,
                su.islope_l, su.last_l, su.one_l, plan.xs_big,
                plan.tw_inv_small, plan.n_inv_small, plan.tw_fwd_big,
                plan.fri_inv_pows, su.eta_l, su.inv4_l, su.inv_z2)

t0 = time.perf_counter()
parts = dispatch()
jax.block_until_ready(parts)
report["warmup_s"] = time.perf_counter() - t0
print(f"warmup: {report['warmup_s']:.1f} s", flush=True)

pool = cf.ThreadPoolExecutor(16)

def best_of(fn, reps=3):
    best = None
    for _ in range(reps):
        dt = fn()
        best = dt if best is None else min(best, dt)
    return best

def tA():
    t0 = time.perf_counter()
    parts = dispatch()
    jax.device_get(parts)
    return time.perf_counter() - t0

def tB():
    t0 = time.perf_counter()
    parts = dispatch()
    futs = [pool.submit(jax.device_get, p) for p in parts]
    [f.result() for f in futs]
    return time.perf_counter() - t0

def tC():
    t0 = time.perf_counter()
    parts = dispatch()
    futs = [pool.submit(np.asarray, p) for p in parts]
    [f.result() for f in futs]
    return time.perf_counter() - t0

def tD():
    t0 = time.perf_counter()
    parts = dispatch()
    prover._fetch_prepped(parts, su)
    return time.perf_counter() - t0

def tE():
    t0 = time.perf_counter()
    parts = dispatch()
    mlw = getattr(su, "main_leaf_words", 24)
    def work(i):
        name, shape = su.sections[i]
        arr = np.ascontiguousarray(jax.device_get(parts[i])
                                   ).reshape(shape)
        return name, prover._prep_section(name, arr, mlw)
    futs = [pool.submit(work, i) for i in range(len(parts))]
    pre = dict(f.result() for f in futs)
    prover._assemble_prepped(pre, su)
    return time.perf_counter() - t0

for name, fn in [("A_devget_tuple", tA), ("B_thread_devget", tB),
                 ("C_thread_asarray", tC), ("D_current_prepped", tD),
                 ("E_thread_devget_decode", tE)]:
    report[name] = best_of(fn)
    print(f"{name}: {report[name]*1e3:.1f} ms", flush=True)

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "exp_r4fetch2.json"), "w") as fh:
    json.dump(report, fh, indent=2)
print(json.dumps(report, indent=2))
