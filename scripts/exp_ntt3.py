"""Round-3 NTT experiments on chip (fetch-forced timing).

Compares the scan-structured Pease NTT (stacked [logn, n/2] twiddle
table) against the strided-twiddle static-loop form (twiddles built
per stage from the single [n] power table — the memory-lean shape that
makes the 2^23-point domain fit in HBM). Also probes where the limb
NTT sits against the measured elementwise ceiling.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_axon"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from starks_tpu.ops import fused, limbs as fl
from starks_tpu.utils import timing

report = {"device": str(jax.devices()[0])}

for logn in (16, 20):
    n = 2 ** logn
    G = pow(7, (fl.MODULUS - 1) // n, fl.MODULUS)
    table_np = fused._power_table_np(G, n)
    table = jnp.asarray(table_np)
    tw = jnp.asarray(fused._stacked_twiddles(table_np))
    rng = np.random.default_rng(5)
    vals = jnp.asarray(rng.integers(0, 2 ** 16, (n, 16), dtype=np.uint32))

    f_scan = jax.jit(fused.ntt_dif)
    f_str = jax.jit(fused.ntt_dif_strided)
    t_scan, out_scan = timing.timed(f_scan, vals, tw, reps=3)
    t_str, out_str = timing.timed(f_str, vals, table, reps=3)
    same = bool(np.array_equal(np.asarray(out_scan), np.asarray(out_str)))
    row = {"scan_s": t_scan, "strided_s": t_str, "match": same,
           "points_per_s_best": n / min(t_scan, t_str)}
    report[f"ntt_2e{logn}"] = row
    print(logn, json.dumps(row), flush=True)

# single fl.mul at 2^20 for the kernel-gap bisect
n = 2 ** 20
rng = np.random.default_rng(7)
a = jnp.asarray(rng.integers(0, 2 ** 16, (n, 16), dtype=np.uint32))
b = jnp.asarray(rng.integers(0, 2 ** 16, (n, 16), dtype=np.uint32))
f_mul = jax.jit(fl.mul)
t_mul, _ = timing.timed(f_mul, a, b, reps=3)
report["fl_mul_2e20_s"] = t_mul
report["modmul_per_s"] = n / t_mul
print("fl.mul 2^20:", t_mul, "->", n / t_mul / 1e6, "M modmul/s", flush=True)

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "exp_ntt3.json"), "w") as fh:
    json.dump(report, fh, indent=2)
