"""Round-3 on-chip prove timing: host-trace fused core at 2^13 / 2^16.

Wall-clock around mk_mimc_proof is inherently fetch-forced (the proof
bytes only exist after the bulk D2H), so these numbers are honest
without extra synchronization.
"""

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

CONSTANTS = [(i ** 7) ^ 42 for i in range(64)]
INP = 3
report = {"device": str(jax.devices()[0])}

for log2 in (13, 16):
    steps = 2 ** log2
    t0 = time.perf_counter()
    proof = tp.mk_mimc_proof(INP, steps, CONSTANTS)
    warm = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        proof = tp.mk_mimc_proof(INP, steps, CONSTANTS)
        times.append(time.perf_counter() - t0)
    row = {"warmup_s": warm, "prove_s_best": min(times),
           "prove_s_all": times,
           "stages": dict(tp.LAST_PROOF_TIMINGS)}
    report[f"2e{log2}"] = row
    print(log2, json.dumps(row), flush=True)

    # Oracle check at 2^13 only (cheap enough).
    if log2 == 13:
        from oracle import stark as ostark
        from oracle.mimc import mimc as omimc
        out = omimc(INP, steps, CONSTANTS)
        ok = ostark.verify_mimc_proof(INP, steps, CONSTANTS, out, proof)
        row["oracle_verified"] = bool(ok)
        print("oracle verify:", ok, flush=True)

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "prof_prove3.json"), "w") as fh:
    json.dump(report, fh, indent=2)
