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


class TestFrameworkFRI:
    """The FRAMEWORK FRI pair (device prove_low_degree + host
    verify_low_degree_proof) round-trips on genuine low-degree data and
    REJECTS high-degree data — previously only the oracle's verifier had
    the negative test (round-2 verdict, weak #7)."""

    def _setup(self, low_degree: bool):
        import random
        import jax.numpy as jnp
        from oracle.fft import fft as offt
        from starks_tpu.ops import ntt as ntt_mod
        from starks_tpu.ops.merkle import MerkleTree
        from starks_tpu.utils.conversions import ints_to_limbs

        P = tprover.MODULUS
        n, deg = 1024, 256
        g = pow(7, (P - 1) // n, P)
        rng = random.Random(9)
        if low_degree:
            poly = [rng.randrange(P) for _ in range(deg)]
            evals = offt(poly, P, g)
        else:
            evals = [rng.randrange(P) for _ in range(n)]
        vals = jnp.asarray(ints_to_limbs(evals))
        dom = ntt_mod.get_domain(n, g)
        root = MerkleTree.from_values(vals).root
        proof = tprover.prove_low_degree(vals, dom, deg)
        return root, g, proof, deg

    def test_low_degree_roundtrip(self):
        root, g, proof, deg = self._setup(low_degree=True)
        assert tverifier.verify_low_degree_proof(root, g, proof, deg)

    def test_high_degree_rejected(self):
        root, g, proof, deg = self._setup(low_degree=False)
        with pytest.raises(AssertionError):
            tverifier.verify_low_degree_proof(root, g, proof, deg)
