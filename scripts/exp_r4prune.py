"""Round-4: on-chip validation + headline timing of the pruned-bundle
payload (tree_bundle top_levels + tops_* sections).

Checks the 2^13 proof is byte-identical to the independent oracle
prover, then measures the warm prove loop (the driver headline)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_axon"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from starks_tpu import prover
from starks_tpu.utils import timing

STEPS = 8192
CONSTS = [(i ** 7) ^ 42 for i in range(64)]
INP = 3

report = {"steps": STEPS}

t0 = time.perf_counter()
proof = prover.mk_mimc_proof_fused(INP, STEPS, CONSTS)
report["warmup_s"] = time.perf_counter() - t0
print(f"warmup: {report['warmup_s']:.1f} s", flush=True)

su = prover._FusedSetup.get(STEPS, prover.REFERENCE)
report["payload_bytes"] = sum(
    int(np.prod(sh)) * 4 for _, sh in su.sections)
print(f"payload: {report['payload_bytes']} B "
      f"({len(su.sections)} sections)", flush=True)

print("oracle cross-check…", flush=True)
from oracle import stark as ostark
want = ostark.mk_mimc_proof(INP, STEPS, CONSTS)


def eq(a, b):
    if isinstance(a, (list, tuple)):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    return a == b


report["oracle_bit_exact"] = eq(proof, want)
print(f"oracle_bit_exact: {report['oracle_bit_exact']}", flush=True)
assert report["oracle_bit_exact"]

iters = []
for i in range(10):
    rtt = timing.transfer_floor(reps=2)
    t0 = time.perf_counter()
    proof = prover.mk_mimc_proof_fused(INP, STEPS, CONSTS)
    dt = time.perf_counter() - t0
    iters.append({"rtt_ms": rtt * 1e3, "prove_ms": dt * 1e3,
                  "stages": {k: v * 1e3 for k, v in
                             prover.LAST_PROOF_TIMINGS.items()}})
    print(f"iter {i}: rtt {rtt*1e3:.1f} ms  prove {dt*1e3:.1f} ms",
          flush=True)
report["iters"] = iters
best = min(it["prove_ms"] for it in iters)
report["prove_ms_best"] = best
report["speedup_vs_cpu"] = 4745.7 / best
print(f"best {best:.1f} ms -> {report['speedup_vs_cpu']:.1f}x",
      flush=True)

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "exp_r4prune.json"), "w") as fh:
    json.dump(report, fh, indent=2)
print(json.dumps({k: v for k, v in report.items() if k != "iters"}))
