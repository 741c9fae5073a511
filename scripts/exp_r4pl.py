"""Round-4: first on-chip run of the Pallas-integrated fused prover.

Proves 2^13 (and optionally 2^16) with the Pallas core (the TPU
default now), verifies against the oracle verifier, and reports the
compute/transfer split (cf. exp_r4split.py for the XLA core's 17.8 ms
compute).
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

STEPS = int(os.environ.get("STEPS", "8192"))
CONSTS = [(i ** 7) ^ 42 for i in range(64)]
INP = 3

report = {"steps": STEPS}
floor = timing.transfer_floor()
report["floor_s"] = floor

su = prover._FusedSetup.get(STEPS, prover.REFERENCE)
report["pallas"] = su.pallas
print(f"pallas core: {su.pallas}", flush=True)
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
report["warmup_s"] = time.perf_counter() - t0
print(f"warmup (compile): {report['warmup_s']:.1f} s", flush=True)

# compute + floor
best = None
for _ in range(3):
    t0 = time.perf_counter()
    out = core(*args)
    timing.force(out)
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
report["compute_plus_floor_s"] = best
report["compute_s"] = best - floor
print(f"compute: ~{(best-floor)*1e3:.1f} ms (+floor {floor*1e3:.1f})",
      flush=True)

# end-to-end prove via the public entry (includes host assembly)
best = None
for _ in range(3):
    t0 = time.perf_counter()
    proof = prover.mk_mimc_proof_fused(INP, STEPS, CONSTS)
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
report["prove_s"] = best
report["stage_timings"] = dict(prover.LAST_PROOF_TIMINGS)
print(f"prove e2e: {best*1e3:.1f} ms", flush=True)

# verify against the oracle verifier (bit-exactness end to end)
from oracle import stark as ostark
from oracle.mimc import mimc as omimc_fn
output = omimc_fn(INP, STEPS, CONSTS)
t0 = time.perf_counter()
ok = ostark.verify_mimc_proof(INP, STEPS, CONSTS, output, proof)
report["verified"] = bool(ok)
report["oracle_verify_s"] = time.perf_counter() - t0
print(f"oracle verify: {ok}", flush=True)

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "exp_r4pl.json"), "w") as fh:
    json.dump(report, fh, indent=2)
print(json.dumps(report, indent=2))
