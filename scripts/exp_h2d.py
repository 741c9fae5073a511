"""Measure native host trace generation + H2D upload (raw and packed).

Complements exp_trace.py (which established: device trace scan = 1.20 s
at 2^13, unroll does not help — dependent-step latency, not loop
overhead). This script times the host-side replacement path.
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

from starks_tpu.ops import fused
from starks_tpu.models import mimc as mimc_model
from starks_tpu.utils import timing

CONSTANTS = [(i ** 7) ^ 42 for i in range(64)]
INP = 3
report = {}

for LOG2 in (13, 16, 20):
    steps = 2 ** LOG2
    row = {}
    t0 = time.perf_counter()
    trace_np = np.asarray(mimc_model.trace_limbs(INP, steps, CONSTANTS))
    row["native_trace_s"] = time.perf_counter() - t0

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        dev = jax.device_put(trace_np)
        timing.force(dev)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    row["h2d_raw_s"] = best
    row["h2d_raw_MBps"] = trace_np.size * 4 / best / 1e6

    packed = fused.pack_limbs_np(trace_np)
    f_unpack = jax.jit(fused.unpack_limbs)
    best2 = None
    for _ in range(3):
        t0 = time.perf_counter()
        dev = f_unpack(jax.device_put(packed))
        timing.force(dev)
        dt = time.perf_counter() - t0
        best2 = dt if best2 is None else min(best2, dt)
    row["h2d_packed_s"] = best2
    same = bool(np.array_equal(np.asarray(f_unpack(jnp.asarray(packed))),
                               trace_np))
    row["unpack_matches"] = same
    report[f"2e{LOG2}"] = row
    print(LOG2, json.dumps(row), flush=True)

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "exp_h2d.json"), "w") as fh:
    json.dump(report, fh, indent=2)
