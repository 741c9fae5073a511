"""Probe: is the traced_core HLO (and therefore the persistent compile
cache key) stable across processes? Lowers the full 2^13 traced core
WITHOUT compiling, hashes the stablehlo text, and dumps it to a file
for diffing.

Usage: python scripts/exp_hlo_stable.py /tmp/hlo_a.txt
"""
import hashlib
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np

import starks_tpu.prover as tp
from starks_tpu.config import REFERENCE
from starks_tpu.models import mimc as mimc_model
from starks_tpu.ops import fused

steps = 2 ** 13
CONSTANTS = [(i ** 7) ^ 42 for i in range(64)]

t0 = time.time()
su = tp._FusedSetup.get(steps, REFERENCE)
plan = su.plan
trace = np.asarray(mimc_model.trace_limbs(3, steps, CONSTANTS))
k_ext = su.k_ext_limbs(CONSTANTS)
cs_expand = su.expand_consts(CONSTANTS)
ckpts = jnp.asarray(tp._trace_ckpts_packed(trace, su))
su.core()
print(f"# setup: {time.time() - t0:.1f}s", file=sys.stderr)

t0 = time.time()
lowered = jax.jit(su._traced_core_fn).lower(
    ckpts, cs_expand, k_ext, su.zni8, su.h_pows, su.islope_l,
    su.last_l, su.one_l, plan.xs_big, plan.tw_inv_small,
    plan.n_inv_small, plan.tw_fwd_big, plan.fri_inv_pows, su.eta_l,
    su.inv4_l, su.inv_z2)
text = lowered.as_text()
print(f"# lower: {time.time() - t0:.1f}s, {len(text)} chars",
      file=sys.stderr)

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hlo_dump.txt"
with open(out, "w") as fh:
    fh.write(text)
print(hashlib.sha256(text.encode()).hexdigest(), os.environ.get(
    "PYTHONHASHSEED", "random"))
