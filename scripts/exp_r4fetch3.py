"""Round-4: where do the ~12 ms between the measured fetch floor
(~37 ms = RTT + stream, exp_r4par fetch_during_compute_s) and the
observed dev-stage (~48-52 ms, exp_r4warm) go?

Instruments the per-section arrival timeline of the real prover
dispatch, then tries fetch variants:
  A) current _fetch_prepped (pool gets + in-worker decode)
  B) pool gets, decode AFTER (main thread)    -> isolates GIL cost
  C) big-sections-first submission order
  D) single jax.device_get(list) of all parts -> runtime-batched
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

print("warming…", flush=True)
t0 = time.perf_counter()
parts = core(*args)
jax.block_until_ready(parts)
_ = prover._fetch_prepped(parts, su)
report["warmup_s"] = time.perf_counter() - t0
print(f"warm {report['warmup_s']:.1f} s", flush=True)

sizes = [int(np.prod(sh)) * 4 for _, sh in su.sections]
report["sections"] = [
    {"name": n, "bytes": s} for (n, _), s in zip(su.sections, sizes)]
print([(n, s) for (n, _), s in zip(su.sections, sizes)], flush=True)


def timeline_run():
    t_d0 = time.perf_counter()
    parts = core(*args)
    t_disp = time.perf_counter()
    for p in parts:
        p.copy_to_host_async()
    t_async = time.perf_counter()
    arrivals = [None] * len(parts)

    def work(i):
        arr = np.ascontiguousarray(jax.device_get(parts[i]))
        arrivals[i] = time.perf_counter() - t_d0
        return arr

    futs = [prover._fetch_pool().submit(work, i)
            for i in range(len(parts))]
    outs = [f.result() for f in futs]
    t_all = time.perf_counter()
    return {
        "dispatch_ms": (t_disp - t_d0) * 1e3,
        "async_issue_ms": (t_async - t_disp) * 1e3,
        "arrival_ms": [round(a * 1e3, 2) for a in arrivals],
        "total_ms": (t_all - t_d0) * 1e3,
    }


report["timeline"] = [timeline_run() for _ in range(3)]
for t in report["timeline"]:
    print(f"disp {t['dispatch_ms']:.1f} issue {t['async_issue_ms']:.1f} "
          f"total {t['total_ms']:.1f} arrivals {t['arrival_ms']}",
          flush=True)


def run_variant(fetch_fn, label, reps=4):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        parts = core(*args)
        pre = fetch_fn(parts)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    report[label] = best * 1e3
    print(f"{label}: {best*1e3:.1f} ms", flush=True)
    return pre


def fetch_A(parts):
    return prover._fetch_prepped(parts, su)


def fetch_B(parts):
    arrs = prover._fetch_parts_np(parts)
    return prover._decode_fused(arrs, su)


def fetch_C(parts):
    for p in parts:
        p.copy_to_host_async()
    order = sorted(range(len(parts)), key=lambda i: -sizes[i])
    mlw = getattr(su, "main_leaf_words", 24)

    def work(i):
        name, shape = su.sections[i]
        arr = np.ascontiguousarray(jax.device_get(parts[i])
                                   ).reshape(shape)
        return name, prover._prep_section(name, arr, mlw)

    futs = {i: prover._fetch_pool().submit(work, i) for i in order}
    return dict(futs[i].result() for i in range(len(parts)))


def fetch_D(parts):
    arrs = jax.device_get(list(parts))
    return prover._decode_fused(arrs, su)


run_variant(fetch_A, "A_current_ms")
run_variant(fetch_B, "B_decode_after_ms")
run_variant(fetch_C, "C_bigfirst_ms")
run_variant(fetch_D, "D_devget_list_ms")

rtt = timing.transfer_floor(reps=3)
report["rtt_ms"] = rtt * 1e3
print(f"ambient rtt {rtt*1e3:.1f} ms", flush=True)

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "exp_r4fetch3.json"), "w") as fh:
    json.dump(report, fh, indent=2)
print(json.dumps({k: v for k, v in report.items() if k != "timeline"},
                 default=str))
