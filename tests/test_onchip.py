"""On-chip (axon) e2e tests: real proofs on the TPU, byte-compared to
the pure-Python oracle (VERDICT r4 ask #7 — promote the scripts-only
on-chip oracle comparison into a repeatable pass/fail suite).

Skipped on the default CPU suite; run with
    STARKS_TPU_TEST_PLATFORM=axon python -m pytest tests/test_onchip.py
First run pays the remote Mosaic compile (~10 min/graph cold; seconds
once the persistent cache under .jax_cache_axon is warm).

The TPU default execution form is the Pallas core
(prover._FusedSetup.pallas == True on the tpu backend), so these tests
exercise exactly the configuration the benchmarks report, unlike the
CPU suite (XLA scan forms) and the interpret-mode Pallas unit tests
(tests/test_plimbs.py).
"""

import os

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("STARKS_TPU_TEST_PLATFORM") != "axon",
    reason="on-chip test; set STARKS_TPU_TEST_PLATFORM=axon")

CONSTANTS = [(i ** 7) ^ 42 for i in range(64)]


def test_e2e_2e12_on_chip():
    from starks_tpu import prover as tp
    from starks_tpu import verifier as tv
    from starks_tpu.models.mimc import mimc_forward

    steps = 2 ** 12
    inp = 3
    proof = tp.mk_mimc_proof(inp, steps, CONSTANTS)
    out = mimc_forward(inp, steps, CONSTANTS)
    assert tv.verify_mimc_proof(inp, steps, CONSTANTS, out, proof)

    bad = [b for b in proof]
    bad[0] = bytes(32)
    with pytest.raises(AssertionError):
        tv.verify_mimc_proof(inp, steps, CONSTANTS, out, bad)


def test_oracle_bit_exact_2e10_on_chip():
    """Full proof-object byte equality vs the oracle at 2^10 (the
    oracle needs ~0.3 s at this size; the chip pays its compile once).
    This is the on-chip version of the CPU suite's core contract."""
    from oracle.stark import mk_mimc_proof as oracle_prove
    from starks_tpu import prover as tp
    from starks_tpu import serialize as ser

    steps = 2 ** 10
    inp = 3
    dev = tp.mk_mimc_proof(inp, steps, CONSTANTS)
    ora = oracle_prove(inp, steps, CONSTANTS)
    assert ser.serialize(dev) == ser.serialize(ora)


def test_oracle_bit_exact_2e13_on_chip():
    """Byte equality vs the oracle at the headline size (2^13). The
    oracle run costs a few seconds of host CPU."""
    from oracle.stark import mk_mimc_proof as oracle_prove
    from starks_tpu import prover as tp
    from starks_tpu import serialize as ser

    steps = 2 ** 13
    inp = 3
    dev = tp.mk_mimc_proof(inp, steps, CONSTANTS)
    ora = oracle_prove(inp, steps, CONSTANTS)
    assert ser.serialize(dev) == ser.serialize(ora)


def test_air_fused_on_chip():
    """AIR Pallas core on chip: fib-square proof verifies, and the
    fused (pruned-payload) proof object matches the staged prove_air
    reference path element-for-element."""
    from starks_tpu.air import prove_air, prove_air_fused, verify_air
    from starks_tpu.models.fib_square import fib_square_air

    steps = 2 ** 10
    air = fib_square_air()
    fused_p = prove_air_fused(air, [1, 1], steps)
    assert verify_air(air, steps, fused_p)

    staged_p = prove_air(air, [1, 1], steps)

    def eq(a, b):
        if isinstance(a, bytes) or isinstance(b, bytes):
            return a == b
        if isinstance(a, (int, str)) or isinstance(b, (int, str)):
            return a == b
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))

    assert eq(fused_p, staged_p)


def test_batch_matches_serial_on_chip():
    """Batch prover (vmapped core) emits per-claim proofs bit-identical
    to the serial fused prover."""
    from starks_tpu import prover as tp
    from starks_tpu import serialize as ser

    steps = 2 ** 10
    inps = [3, 5, 7, 9]
    batch = tp.mk_mimc_proof_batch_fused(inps, steps, CONSTANTS, chunk=4)
    for inp, bp in zip(inps, batch):
        sp = tp.mk_mimc_proof(inp, steps, CONSTANTS)
        assert ser.serialize(bp) == ser.serialize(sp)
