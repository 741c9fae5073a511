"""Tests for the one-dispatch fused prover path (ops/fused.py).

Anchors (SURVEY.md §5): cross-implementation golden comparison against
the staged kernels (ops/ntt.py, ops/merkle.py) and the pure-Python
oracle — full proof objects must be byte-identical to `oracle.stark`.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from starks_tpu.ops import fused
from starks_tpu.ops import limbs as fl
from starks_tpu.ops import ntt as ntt_mod
from starks_tpu.ops import blake2s as b2
from starks_tpu.ops.merkle import MerkleTree
from starks_tpu.utils.conversions import ints_to_limbs, limbs_to_ints


def _rand_limbs(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**16, (n, 16), dtype=np.uint32)


class TestFusedNTT:
    def test_dif_matches_staged_ntt(self):
        n = 256
        G = pow(7, (fl.MODULUS - 1) // n, fl.MODULUS)
        dom = ntt_mod.get_domain(n, G)
        vals = jnp.asarray(_rand_limbs(n))
        tw = jnp.asarray(fused._stacked_twiddles(np.asarray(dom.powers)))
        out = jax.jit(fused.ntt_dif)(vals, tw)
        # DIF output is bit-reversed; un-reverse and compare.
        out_nat = jnp.take(out, dom.brev, axis=0)
        ref = ntt_mod.ntt(vals, dom)
        assert bool(jnp.all(out_nat == ref))

    def test_dit_matches_staged_ntt(self):
        n = 256
        G = pow(7, (fl.MODULUS - 1) // n, fl.MODULUS)
        dom = ntt_mod.get_domain(n, G)
        vals = jnp.asarray(_rand_limbs(n, seed=1))
        tw = jnp.asarray(fused._stacked_twiddles(np.asarray(dom.powers)))
        # DIT consumes bit-reversed input, emits natural order.
        out = jax.jit(fused.ntt_dit)(jnp.take(vals, dom.brev, axis=0), tw)
        ref = ntt_mod.ntt(vals, dom)
        assert bool(jnp.all(out == ref))

    def test_lde_matches_staged(self):
        steps, ext = 64, 8
        precision = steps * ext
        G2 = pow(7, (fl.MODULUS - 1) // precision, fl.MODULUS)
        G1 = pow(G2, ext, fl.MODULUS)
        plan = fused.FusedPlan.get(steps, precision, G1, G2, 1)
        trace = jnp.asarray(_rand_limbs(steps, seed=2))
        out = jax.jit(fused.lde_fused)(trace, plan.tw_inv_small,
                                       plan.n_inv_small, plan.tw_fwd_big)
        d1 = ntt_mod.get_domain(steps, G1)
        d2 = ntt_mod.get_domain(precision, G2)
        ref, _ = ntt_mod.lde(trace, d1, d2)
        assert bool(jnp.all(out == ref))


class TestFusedTree:
    def test_tree_matches_staged_merkle(self):
        n = 128
        vals = jnp.asarray(_rand_limbs(n, seed=3))
        words = b2.limbs_to_words(vals)
        lvl1, rest, root = jax.jit(fused.tree_build)(words)
        ref = MerkleTree.from_values(vals)
        assert bool(jnp.all(root == ref.root_words))
        # every level's valid prefix matches
        assert bool(jnp.all(lvl1 == ref.levels[0]))
        for k in range(len(ref.levels) - 1):
            m = ref.levels[k + 1].shape[0]
            assert bool(jnp.all(rest[k][:m] == ref.levels[k + 1]))

    def test_bundle_matches_staged(self):
        n = 128
        vals = jnp.asarray(_rand_limbs(n, seed=4))
        words = b2.limbs_to_words(vals)
        lvl1, rest, root = jax.jit(fused.tree_build)(words)
        ref = MerkleTree.from_values(vals)
        idx = jnp.asarray([0, 1, 17, 126], jnp.int32)
        logn = n.bit_length() - 1
        bundle = np.asarray(fused.tree_bundle(words, lvl1, rest, idx, logn))
        ref_bundle = np.asarray(ref.branch_bundle(idx))
        assert np.array_equal(bundle, ref_bundle)


class TestFusedProof:
    @pytest.mark.parametrize("steps", [64, 128])
    def test_bit_identical_to_oracle(self, steps):
        from starks_tpu.prover import mk_mimc_proof_fused
        from oracle import stark as ostark
        from oracle.mimc import mimc as omimc

        constants = [(i ** 7) ^ 42 for i in range(min(64, steps // 2))]
        inp = 3
        proof = mk_mimc_proof_fused(inp, steps, constants)
        oproof = ostark.mk_mimc_proof(inp, steps, constants)
        assert _proof_eq(proof, oproof)

        output = omimc(inp, steps, constants)
        assert ostark.verify_mimc_proof(inp, steps, constants, output,
                                        proof)


    def test_batched_core_bit_identical(self):
        # The vmapped core (config 5 batch shape) must emit the same
        # proof bytes per claim as single dispatches.
        from starks_tpu.prover import (mk_mimc_proof_fused,
                                       mk_mimc_proof_batch_fused)
        steps = 64
        constants = [(i ** 7) ^ 42 for i in range(16)]
        inps = [3, 5, 7]
        batch = mk_mimc_proof_batch_fused(inps, steps, constants, chunk=2)
        for inp, got in zip(inps, batch):
            assert _proof_eq(got, mk_mimc_proof_fused(inp, steps,
                                                      constants))


def _proof_eq(a, b):
    if isinstance(a, (list, tuple)):
        if not isinstance(b, (list, tuple)) or len(a) != len(b):
            return False
        return all(_proof_eq(x, y) for x, y in zip(a, b))
    return a == b


class TestUnrolledForms:
    """The statically-unrolled tree/FRI forms (the TPU execution path)
    must be bit-identical to the scan forms the CPU suite exercises."""

    def test_tree_build_unrolled_matches(self):
        vals = jnp.asarray(_rand_limbs(256, seed=12))
        words = b2.limbs_to_words(vals)
        lvl1_s, rest_s, root_s = jax.jit(fused.tree_build)(words)
        lvl1_u, levels_u, root_u = fused.tree_build_unrolled(words)
        assert np.array_equal(np.asarray(root_s), np.asarray(root_u))
        assert np.array_equal(np.asarray(lvl1_s), np.asarray(lvl1_u))
        m = 256
        for k, lvl in enumerate(levels_u):
            true = m >> (k + 2)
            assert lvl.shape[0] == true
            assert np.array_equal(np.asarray(rest_s[k][:true]),
                                  np.asarray(lvl))

    def test_unrolled_core_bit_identical(self):
        from starks_tpu import prover as tp
        from starks_tpu.models import mimc as mimc_model
        steps = 64
        constants = [(i ** 7) ^ 42 for i in range(16)]
        inp = 3
        want = tp.mk_mimc_proof(inp, steps, constants)  # scan forms (CPU)
        su = tp._FusedSetup(steps, tp.REFERENCE, unrolled=True)
        trace = np.asarray(mimc_model.trace_limbs(inp, steps, constants))
        got = tp._prove_from_trace_fused(trace, steps, constants,
                                         _setup=su)
        assert _proof_eq(got, want)


class TestStridedForms:
    """ADVICE r3 (medium): the big-domain execution path — strided
    twiddles (ntt_dif_strided/lde_strided) + the lean-mul barrier mode +
    the strided-gated traced core — only activates at precision >=
    2^21, which the CPU suite never reaches. Force it at steps=64 by
    patching FusedPlan.STRIDED_THRESHOLD and assert the proof is
    bit-identical to the oracle."""

    def test_strided_core_bit_identical_to_oracle(self):
        from starks_tpu import prover as tp
        from starks_tpu.models import mimc as mimc_model
        from oracle import stark as ostark

        steps = 64
        constants = [(i ** 7) ^ 42 for i in range(16)]
        inp = 3
        want = ostark.mk_mimc_proof(inp, steps, constants)

        saved_thresh = fused.FusedPlan.STRIDED_THRESHOLD
        saved_cache = dict(fused.FusedPlan._cache)
        fused.FusedPlan.STRIDED_THRESHOLD = 1
        try:
            fused.FusedPlan._cache.clear()
            su = __import__("starks_tpu").prover._FusedSetup(
                steps, tp.REFERENCE)
            assert su.plan.strided, "threshold patch did not take"
            trace = np.asarray(mimc_model.trace_limbs(inp, steps,
                                                      constants))
            got = tp._prove_from_trace_fused(trace, steps, constants,
                                             _setup=su)
        finally:
            fused.FusedPlan.STRIDED_THRESHOLD = saved_thresh
            fused.FusedPlan._cache.clear()
            fused.FusedPlan._cache.update(saved_cache)
        assert _proof_eq(got, want)


class TestPallasCore:
    """The Pallas-integrated core (the TPU default path, round 4) must
    be bit-identical to the oracle. Runs in Pallas interpret mode on
    the CPU backend — same kernel math as compiled Mosaic (the on-chip
    run is oracle-verified in scripts/exp_r4pl.json)."""

    def test_pallas_core_bit_identical_to_oracle(self):
        from starks_tpu import prover as tp
        from starks_tpu.models import mimc as mimc_model
        from oracle import stark as ostark

        steps = 64
        constants = [(i ** 7) ^ 42 for i in range(16)]
        inp = 3
        want = ostark.mk_mimc_proof(inp, steps, constants)
        su = tp._FusedSetup(steps, tp.REFERENCE, pallas=True)
        assert su.pallas and su.plan.pallas
        trace = np.asarray(mimc_model.trace_limbs(inp, steps, constants))
        got = tp._prove_from_trace_fused(trace, steps, constants,
                                         _setup=su)
        assert _proof_eq(got, want)
