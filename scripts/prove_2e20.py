"""Config-4 scale probe: 2^20-steps MiMC proof on ONE chip (2^23-point
domain). Uses the strided-twiddle memory-lean plan (ops/fused.py).
Result feeds bench_details.json's config4 row."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_axon"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from starks_tpu import prover as tp
from starks_tpu import verifier as tv
from starks_tpu.models.mimc import mimc_forward

STEPS = 2 ** int(sys.argv[1]) if len(sys.argv) > 1 else 2 ** 20
CONSTANTS = [(i ** 7) ^ 42 for i in range(64)]
INP = 3

t0 = time.perf_counter()
proof = tp.mk_mimc_proof(INP, STEPS, CONSTANTS)
warm = time.perf_counter() - t0
print(f"warmup+prove: {warm:.1f}s", flush=True)

times = []
for _ in range(2):
    t0 = time.perf_counter()
    proof = tp.mk_mimc_proof(INP, STEPS, CONSTANTS)
    times.append(time.perf_counter() - t0)
print("prove times:", times, flush=True)
print("stages:", json.dumps(tp.LAST_PROOF_TIMINGS), flush=True)

t0 = time.perf_counter()
out = mimc_forward(INP, STEPS, CONSTANTS)
ok = tv.verify_mimc_proof(INP, STEPS, CONSTANTS, out, proof)
print(f"verified={ok} in {time.perf_counter()-t0:.2f}s", flush=True)

from starks_tpu import serialize as ser
report = {"steps": STEPS, "warmup_s": warm, "prove_s_best": min(times),
          "stages": dict(tp.LAST_PROOF_TIMINGS), "verified": bool(ok),
          "proof_size_bytes": ser.bin_length(proof)}
with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"prove_2e{STEPS.bit_length()-1}.json"), "w") as fh:
    json.dump(report, fh, indent=2)
print(json.dumps(report))
