"""End-to-end prover tests: the TPU-architecture prover's proofs must be
BIT-IDENTICAL to the oracle's (same roots, same branches, same FRI
transcript) and verify under both verifiers — the core bit-exactness
contract (SURVEY §A / BASELINE.json)."""

import pytest

import oracle.stark as ostark
import oracle.fri as ofri
from oracle.mimc import mimc as oracle_mimc

from starks_tpu import prover as tprover
from starks_tpu import verifier as tverifier

STEPS = 128
CONSTANTS = [(i ** 7) ^ 42 for i in range(32)]
INP = 3


@pytest.fixture(scope="module")
def proofs():
    tpu_proof = tprover.mk_mimc_proof(INP, STEPS, CONSTANTS)
    oracle_proof = ostark.mk_mimc_proof(INP, STEPS, CONSTANTS)
    return tpu_proof, oracle_proof


class TestBitExactness:
    def test_roots_match(self, proofs):
        tpu, orc = proofs
        assert tpu[0] == orc[0], "main tree root differs"
        assert tpu[1] == orc[1], "linear-combination tree root differs"

    def test_full_proof_identical(self, proofs):
        tpu, orc = proofs
        assert tpu == orc

    def test_oracle_verifies_tpu_proof(self, proofs):
        tpu, _ = proofs
        output = oracle_mimc(INP, STEPS, CONSTANTS)
        assert ostark.verify_mimc_proof(INP, STEPS, CONSTANTS, output, tpu)

    def test_tpu_verifies_oracle_proof(self, proofs):
        _, orc = proofs
        output = oracle_mimc(INP, STEPS, CONSTANTS)
        assert tverifier.verify_mimc_proof(INP, STEPS, CONSTANTS, output, orc)

    def test_tpu_verifier_rejects_wrong_output(self, proofs):
        tpu, _ = proofs
        output = oracle_mimc(INP, STEPS, CONSTANTS)
        with pytest.raises(AssertionError):
            tverifier.verify_mimc_proof(INP, STEPS, CONSTANTS,
                                        (output + 1) % tprover.MODULUS, tpu)

    def test_tpu_verifier_rejects_tampered_branch(self, proofs):
        import copy
        tpu, _ = proofs
        output = oracle_mimc(INP, STEPS, CONSTANTS)
        bad = copy.deepcopy(tpu)
        bad[2][0][1] = bytes(32) if bad[2][0][1] != bytes(32) else bytes([1]) * 32
        with pytest.raises(AssertionError):
            tverifier.verify_mimc_proof(INP, STEPS, CONSTANTS, output, bad)


class TestFriFold:
    def test_fold_matches_oracle_column(self):
        """fold4's closed form must equal multi_interp_4 + eval_quartic."""
        import random
        import jax.numpy as jnp
        import numpy as np
        from oracle.field import PrimeField
        from oracle.utils import get_power_cycle
        from starks_tpu.ops import ntt as ntt_mod
        from starks_tpu.ops.fri_fold import fold4
        from starks_tpu.utils.conversions import ints_to_limbs, limbs_to_ints
        from starks_tpu.prover import _const

        P = tprover.MODULUS
        rng = random.Random(3)
        n = 256
        g = pow(7, (P - 1) // n, P)
        vals = [rng.randrange(P) for _ in range(n)]
        sx = rng.randrange(P)

        f = PrimeField(P)
        xs = get_power_cycle(g, P)
        quarter = n // 4
        x_polys = f.multi_interp_4(
            [[xs[i + quarter * j] for j in range(4)] for i in range(quarter)],
            [[vals[i + quarter * j] for j in range(4)] for i in range(quarter)])
        want = [f.eval_quartic(p, sx) for p in x_polys]

        dom = ntt_mod.get_domain(n, g)
        from starks_tpu.utils import hostfield as hf
        got = fold4(jnp.asarray(ints_to_limbs(vals)), dom.powers,
                    _const(pow(g, quarter, P)), _const(sx),
                    _const(hf.inv(4)))
        assert limbs_to_ints(np.asarray(got)) == want
