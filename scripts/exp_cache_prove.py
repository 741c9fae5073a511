"""Probe: does a fresh process's mk_mimc_proof(2^13) hit the persistent
compile cache entry written by a previous run, and how long does the
warmup actually take (trace + cache-load + upload vs compile)?

Usage: python scripts/exp_cache_prove.py [tag] [log2_steps]
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
# NOTE: jax_explain_cache_misses is left OFF — in jax 0.9.0 the
# explain path crashes on lax.scan bodies ("not enough values to
# unpack"); DEBUG logging on jax._src.compiler still reports
# persistent-cache hits/misses.

import logging
logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)
logging.basicConfig(level=logging.INFO)

import starks_tpu.prover as tp

tag = sys.argv[1] if len(sys.argv) > 1 else ""
log2 = int(sys.argv[2]) if len(sys.argv) > 2 else 13
steps = 2 ** log2
CONSTANTS = [(i ** 7) ^ 42 for i in range(64)]

t0 = time.time()
proof = tp.mk_mimc_proof(3, steps, CONSTANTS)
warm = time.time() - t0
t0 = time.time()
proof = tp.mk_mimc_proof(3, steps, CONSTANTS)
hot = time.time() - t0
row = {"tag": tag, "steps": steps, "warmup_s": warm, "hot_s": hot,
       "stage_timings": dict(tp.LAST_PROOF_TIMINGS),
       "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
print(json.dumps(row))
path = os.path.join(_REPO, "scripts", "exp_cache_prove.json")
hist = []
if os.path.exists(path):
    with open(path) as fh:
        hist = json.load(fh)
hist.append(row)
with open(path, "w") as fh:
    json.dump(hist, fh, indent=2)
