"""AIR generalization tests: Fibonacci-square (config 3) and MiMC
expressed as an AIR — prove/verify round-trips, tamper rejection, and
boundary-value binding."""

import copy

import pytest

from starks_tpu import air as air_mod
from starks_tpu.air import (AIR, prove_air, prove_air_fused, verify_air,
                            _FusedAIRSetup)
from starks_tpu.models.fib_square import (fib_square_air, fib_square_output,
                                          MODULUS)

STEPS = 64


@pytest.fixture(scope="module")
def fib_proof():
    air = fib_square_air()
    proof = prove_air(air, [1, 1], STEPS)
    return air, proof


class TestFibSquare:
    def test_prove_verify(self, fib_proof):
        air, proof = fib_proof
        assert verify_air(air, STEPS, proof)

    def test_output_bound_in_proof(self, fib_proof):
        air, proof = fib_proof
        boundary = dict(proof[5])
        assert boundary[(STEPS - 1, 1)] == fib_square_output(1, 1, STEPS)

    def test_wrong_boundary_rejected(self, fib_proof):
        air, proof = fib_proof
        bad = copy.deepcopy(proof)
        bad[5] = [(k, (v + 1) % MODULUS) if k == (STEPS - 1, 1) else (k, v)
                  for k, v in bad[5]]
        with pytest.raises(AssertionError):
            verify_air(air, STEPS, bad)

    def test_tampered_branch_rejected(self, fib_proof):
        air, proof = fib_proof
        bad = copy.deepcopy(proof)
        bad[2][0][1] = bytes(32) if bad[2][0][1] != bytes(32) else b'\x01' * 32
        with pytest.raises(AssertionError):
            verify_air(air, STEPS, bad)


class TestFusedAir:
    def test_fused_bit_identical_and_verifies(self, fib_proof):
        """The one-dispatch AIR core must emit the exact bytes of the
        staged prover (device transcript == host transcript)."""
        air, staged = fib_proof
        fused_p = prove_air_fused(air, [1, 1], STEPS)
        assert fused_p == staged
        assert verify_air(air, STEPS, fused_p)


class TestMimcAsAir:
    """MiMC expressed through the generic AIR machinery (width 1, one
    periodic constant column) — validates constants handling."""

    def _air(self, constants):
        def step(state, consts):
            return [(state[0] ** 3 + consts[0]) % MODULUS]

        def transition(cur, nxt, consts, ops):
            return [ops.sub(nxt[0], ops.add(ops.cube(cur[0]), consts[0]))]

        return AIR(width=1, step_fn=step, transition=transition,
                   num_constraints=1, constants=[constants],
                   boundary_points=lambda steps: [(0, 0), (steps - 1, 0)])

    def test_prove_verify(self):
        constants = [(i ** 7) ^ 42 for i in range(16)]
        air = self._air(constants)
        proof = prove_air(air, [3], STEPS)
        assert verify_air(air, STEPS, proof)
        # Output must equal the MiMC forward value.
        from starks_tpu.models.mimc import mimc_forward
        boundary = dict(proof[5])
        assert boundary[(STEPS - 1, 0)] == mimc_forward(3, STEPS, constants)

    def test_wrong_transition_rejected(self):
        constants = [(i ** 7) ^ 42 for i in range(16)]
        air = self._air(constants)
        proof = prove_air(air, [3], STEPS)
        # Verify against an AIR with a DIFFERENT constraint: must fail.
        def bad_transition(cur, nxt, consts, ops):
            return [ops.sub(nxt[0], ops.add(ops.cube(cur[0]),
                                            ops.add(consts[0],
                                                    ops.const(1))))]
        bad_air = AIR(width=1, step_fn=air.step_fn,
                      transition=bad_transition, num_constraints=1,
                      constants=[constants],
                      boundary_points=air.boundary_points)
        with pytest.raises(AssertionError):
            verify_air(bad_air, STEPS, proof)


class TestDeclarativeAIR:
    """Multivariate-polynomial constraint DSL (starks_tpu.algebra) lowered
    through compile_transition: must produce byte-identical proofs to the
    hand-written ops-namespace transition."""

    def test_declarative_matches_imperative(self, fib_proof):
        from starks_tpu.models.fib_square import fib_square_air_declarative
        air, proof = fib_proof
        d_air = fib_square_air_declarative()
        d_proof = prove_air(d_air, [1, 1], STEPS)
        assert d_proof[0] == proof[0] and d_proof[1] == proof[1]
        assert verify_air(d_air, STEPS, d_proof)
        # Cross-verify: same transcript, so each verifies the other.
        assert verify_air(air, STEPS, d_proof)
