"""Round-4b: balanced-chunk D2H layout — on-chip verification + timing.

Measures the full 2^13 prove with the K-equal-chunk output layout
(prover._FusedSetup.flat_layout), checks the proof is bit-identical to
the oracle, and records a best-of-12 with stage splits.
Writes scripts/exp_r6chunk.json.
"""
import json
import os
import resource
import sys
import time

try:
    s, h = resource.getrlimit(resource.RLIMIT_STACK)
    w = 256 * 1024 * 1024
    if s != resource.RLIM_INFINITY and s < w:
        resource.setrlimit(
            resource.RLIMIT_STACK,
            (w if h == resource.RLIM_INFINITY else min(w, h), h))
except (ValueError, OSError):
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

STEPS = 2 ** 13
CONSTANTS = [(i ** 7) ^ 42 for i in range(64)]
INP = 3


def main():
    out = {}
    import starks_tpu.prover as tp
    from starks_tpu import serialize as ser
    from starks_tpu import verifier as tv
    from starks_tpu.models.mimc import mimc_forward

    print("device:", jax.devices()[0], flush=True)
    t0 = time.time()
    proof = tp.mk_mimc_proof(INP, STEPS, CONSTANTS)
    out["warmup_s"] = time.time() - t0
    print("warmup", out["warmup_s"], flush=True)

    su = tp._FusedSetup.get(STEPS, tp.REFERENCE)
    out["n_chunks"] = su.n_chunks
    out["chunk_bytes"] = 4 * su.chunk_words
    out["payload_bytes"] = 4 * su.flat_words

    # Oracle bit-exactness (proof object equality).
    from oracle import stark as ostark

    def proof_eq(a, b):
        if isinstance(a, (list, tuple)):
            return (isinstance(b, (list, tuple)) and len(a) == len(b)
                    and all(proof_eq(x, y) for x, y in zip(a, b)))
        return a == b

    oproof = ostark.mk_mimc_proof(INP, STEPS, CONSTANTS)
    out["oracle_bit_exact"] = proof_eq(proof, oproof)
    output = mimc_forward(INP, STEPS, CONSTANTS)
    out["verified"] = bool(tv.verify_mimc_proof(
        INP, STEPS, CONSTANTS, output, proof))
    out["proof_size_bytes"] = ser.bin_length(proof)
    print("oracle_bit_exact", out["oracle_bit_exact"],
          "verified", out["verified"], flush=True)

    iters = []
    for _ in range(12):
        t0 = time.time()
        tp.mk_mimc_proof(INP, STEPS, CONSTANTS)
        dt = time.time() - t0
        iters.append({"prove_ms": dt * 1e3,
                      "stages": {k: v * 1e3 for k, v
                                 in tp.LAST_PROOF_TIMINGS.items()}})
        print("prove_ms", dt * 1e3, flush=True)
    out["iters"] = iters
    best = min(i["prove_ms"] for i in iters) / 1e3
    out["best_s"] = best
    out["speedup_vs_pinned_cpu"] = 4.7457 / best

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "exp_r6chunk.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("best_s", "speedup_vs_pinned_cpu",
                       "oracle_bit_exact", "verified", "n_chunks")}))


if __name__ == "__main__":
    main()
