"""Round-4: split the 682 s pallas-core warmup into trace / lower /
compile, then measure prove-loop variance with RTT probes interleaved.

Decides: (a) can jax.export or the persistent cache kill the warmup,
(b) how much of prove_s is ambient-RTT luck vs real work.
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
args = (ckpts, cs_expand, k_ext, su.zni8, su.h_pows, su.islope_l,
        su.last_l, su.one_l, plan.xs_big, plan.tw_inv_small,
        plan.n_inv_small, plan.tw_fwd_big, plan.fri_inv_pows, su.eta_l,
        su.inv4_l, su.inv_z2)

su.core()  # builds _traced_core_fn
fn = jax.jit(su._traced_core_fn)

t0 = time.perf_counter()
traced = fn.trace(*args)
report["trace_s"] = time.perf_counter() - t0
print(f"trace: {report['trace_s']:.1f} s", flush=True)

t0 = time.perf_counter()
lowered = traced.lower()
report["lower_s"] = time.perf_counter() - t0
print(f"lower: {report['lower_s']:.1f} s", flush=True)

t0 = time.perf_counter()
compiled = lowered.compile()
report["compile_s"] = time.perf_counter() - t0
print(f"compile: {report['compile_s']:.1f} s", flush=True)

# warm run
t0 = time.perf_counter()
out = compiled(*args)
jax.block_until_ready(out)
report["first_run_s"] = time.perf_counter() - t0
print(f"first run: {report['first_run_s']:.2f} s", flush=True)

# prove loop variance with RTT probes
probes = []
for i in range(10):
    rtt = timing.transfer_floor(reps=2)
    t0 = time.perf_counter()
    proof = prover.mk_mimc_proof_fused(INP, STEPS, CONSTS)
    dt = time.perf_counter() - t0
    probes.append({"rtt_ms": rtt * 1e3, "prove_ms": dt * 1e3,
                   "stages": {k: v * 1e3 for k, v in
                              prover.LAST_PROOF_TIMINGS.items()}})
    print(f"iter {i}: rtt {rtt*1e3:.1f} ms  prove {dt*1e3:.1f} ms",
          flush=True)
report["iters"] = probes

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "exp_r4warm.json"), "w") as fh:
    json.dump(report, fh, indent=2)
print(json.dumps({k: v for k, v in report.items() if k != "iters"},
                 indent=2))
