"""Probe: does the persistent compilation cache serve axon Pallas
graphs across processes? Runs ONE small Pallas kernel jit and reports
compile wall time; run twice (two processes) and compare.

Usage: python scripts/exp_cache_probe.py [tag]
Appends a row to scripts/exp_cache_probe.json.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache_axon"))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_explain_cache_misses", True)

import logging
logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)
logging.basicConfig(level=logging.INFO)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from starks_tpu.ops import plimbs, limbs

rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 2 ** 16, (16, 2048), dtype=np.uint32))
y = jnp.asarray(rng.integers(0, 2 ** 16, (16, 2048), dtype=np.uint32))

fn = jax.jit(plimbs.mul_t)
t0 = time.time()
out = fn(x, y)
np.asarray(out[:1])
t_pallas = time.time() - t0

x2 = x.T
y2 = y.T
fn2 = jax.jit(limbs.mul)
t0 = time.time()
out2 = fn2(x2, y2)
np.asarray(out2[:1])
t_xla = time.time() - t0

row = {"tag": sys.argv[1] if len(sys.argv) > 1 else "",
       "pallas_first_call_s": t_pallas,
       "xla_first_call_s": t_xla,
       "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
print(json.dumps(row))
path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "exp_cache_probe.json")
hist = []
if os.path.exists(path):
    with open(path) as fh:
        hist = json.load(fh)
hist.append(row)
with open(path, "w") as fh:
    json.dump(hist, fh, indent=2)
