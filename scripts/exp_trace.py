"""Round-3 experiment: take the MiMC trace off the device critical path.

Judge-measured (round 2): `fused.trace_scan` at 2^13 costs 1202 ms of
the 1281 ms device time — each of the 8191 scan iterations pays ~150 us
of loop overhead for 16 limbs of work. Candidates measured here with
fetch-forced timing (utils/timing.py):

  A. current scan (baseline)
  B. scan with unroll=K (K dependent rounds per loop iteration)
  C. native C++ host trace + H2D upload of the [steps,16] limb array

Run on the chip:  python scripts/exp_trace.py [steps_log2]
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

from starks_tpu.ops import fused, limbs as fl
from starks_tpu.models import mimc as mimc_model
from starks_tpu.utils import timing
from starks_tpu.utils.conversions import int_to_limbs, ints_to_limbs

LOG2 = int(sys.argv[1]) if len(sys.argv) > 1 else 13
STEPS = 2 ** LOG2
CONSTANTS = [(i ** 7) ^ 42 for i in range(64)]
INP = 3

report = {"steps": STEPS, "device": str(jax.devices()[0])}

floor = timing.transfer_floor()
report["d2h_floor_s"] = floor
print(f"transfer floor: {floor*1e3:.1f} ms", flush=True)

ceiling = timing.measured_ceiling()
report["measured_ceiling_elem_ops_per_s"] = ceiling
print(f"measured ceiling: {ceiling:.3e} elem-op/s", flush=True)

# Common inputs.
inp_l = jnp.asarray(int_to_limbs(INP))
reps = (STEPS - 1 + len(CONSTANTS) - 1) // len(CONSTANTS)
cs_np = np.asarray(ints_to_limbs([c % fl.MODULUS for c in CONSTANTS]))
cs_tiled = jnp.asarray(np.tile(cs_np, (reps, 1))[:STEPS - 1])

# A. current scan --------------------------------------------------------
f_a = jax.jit(fused.trace_scan)
t0 = time.perf_counter()
t_a, out_a = timing.timed(f_a, inp_l, cs_tiled, reps=2)
print(f"A scan(unroll=1): {t_a*1e3:.1f} ms  "
      f"(incl compile in warmup: {time.perf_counter()-t0:.0f}s)", flush=True)
report["scan_u1_s"] = t_a


# B. scan with unroll=K --------------------------------------------------
def make_unrolled(K):
    def tracer(inp_limbs, constants_tiled):
        def step(x, c):
            nx = fl.add(fl.cube(x), c)
            return nx, nx
        _, ys = jax.lax.scan(step, inp_limbs, constants_tiled, unroll=K)
        return jnp.concatenate([inp_limbs[None], ys], axis=0)
    return jax.jit(tracer)


report["scan_unroll_s"] = {}
for K in (32, 128, 512):
    f_b = make_unrolled(K)
    t_b, out_b = timing.timed(f_b, inp_l, cs_tiled, reps=2)
    same = bool(np.array_equal(np.asarray(out_b), np.asarray(out_a)))
    print(f"B scan(unroll={K}): {t_b*1e3:.1f} ms  match={same}", flush=True)
    report["scan_unroll_s"][K] = t_b

# C. native host trace + H2D --------------------------------------------
t0 = time.perf_counter()
trace_np = mimc_model.trace_limbs(INP, STEPS, CONSTANTS)
t_native = time.perf_counter() - t0
trace_np = np.asarray(trace_np)
print(f"C native host trace: {t_native*1e3:.1f} ms", flush=True)
report["native_trace_s"] = t_native
same = bool(np.array_equal(trace_np, np.asarray(out_a)))
print(f"  host trace matches device scan: {same}", flush=True)

best = None
for _ in range(3):
    t0 = time.perf_counter()
    dev = jax.device_put(trace_np)
    timing.force(dev)
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
nbytes = trace_np.size * 4
print(f"C H2D upload [{STEPS},16] u32 ({nbytes/1e6:.1f} MB): "
      f"{best*1e3:.1f} ms -> {nbytes/best/1e6:.1f} MB/s", flush=True)
report["h2d_upload_s"] = best
report["h2d_MB_per_s"] = nbytes / best / 1e6

# C2. packed upload (u16 limbs packed 2-per-u32 -> half the bytes).
packed = (trace_np[:, 0::2] | (trace_np[:, 1::2] << 16)).astype(np.uint32)


def unpack(p):
    lo = p & jnp.uint32(0xFFFF)
    hi = p >> 16
    return jnp.stack([lo, hi], axis=-1).reshape(p.shape[0], 16)


f_unpack = jax.jit(unpack)
best2 = None
for _ in range(3):
    t0 = time.perf_counter()
    dev = f_unpack(jax.device_put(packed))
    timing.force(dev)
    dt = time.perf_counter() - t0
    best2 = dt if best2 is None else min(best2, dt)
same = bool(np.array_equal(np.asarray(f_unpack(jnp.asarray(packed))),
                           trace_np))
print(f"C2 packed H2D+unpack ({nbytes/2e6:.1f} MB): {best2*1e3:.1f} ms  "
      f"match={same}", flush=True)
report["h2d_packed_s"] = best2

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"exp_trace_{LOG2}.json"), "w") as fh:
    json.dump(report, fh, indent=2)
print(json.dumps(report, indent=2))
