"""Device op layers vs host ground truth: blake2s digests vs hashlib,
Merkle roots/branches vs the oracle, NTT vs the oracle FFT (the
cross-implementation golden-vector strategy of SURVEY §5)."""

import hashlib
import random

import jax.numpy as jnp
import numpy as np

from oracle.fft import fft as oracle_fft
from oracle import merkle as omk
from starks_tpu.ops import blake2s as b2
from starks_tpu.ops import limbs as fl
from starks_tpu.ops import merkle as mk
from starks_tpu.ops import ntt as ntt_mod
from starks_tpu.utils.conversions import (
    ints_to_limbs, limbs_to_ints, limbs_to_be_bytes, digest_words_to_bytes,
    bytes_to_digest_words)

P = fl.MODULUS
rng = random.Random(99)


def rand_vals(n):
    return [rng.randrange(P) for _ in range(n)]


class TestBlake2s:
    def test_hash_64B_matches_hashlib(self):
        msgs = [bytes([rng.randrange(256) for _ in range(64)]) for _ in range(32)]
        words = jnp.asarray(np.stack(
            [bytes_to_digest_words(m) for m in msgs]))
        got = np.asarray(b2.blake2s_words(words, 64))
        for i, m in enumerate(msgs):
            assert digest_words_to_bytes(got[i]) == hashlib.blake2s(m).digest()

    def test_hash_192B_matches_hashlib(self):
        msgs = [bytes([rng.randrange(256) for _ in range(192)]) for _ in range(8)]
        words = jnp.asarray(np.stack(
            [bytes_to_digest_words(m) for m in msgs]))
        got = np.asarray(b2.blake2s_words(words, 192))
        for i, m in enumerate(msgs):
            assert digest_words_to_bytes(got[i]) == hashlib.blake2s(m).digest()

    def test_hash_96B_padded_matches_hashlib(self):
        # 96 real bytes hashed as 2 blocks with zero padding, t_final = 96.
        msgs = [bytes([rng.randrange(256) for _ in range(96)]) for _ in range(8)]
        words = jnp.asarray(np.stack(
            [bytes_to_digest_words(m + bytes(32)) for m in msgs]))
        got = np.asarray(b2.blake2s_words(words, 96))
        for i, m in enumerate(msgs):
            assert digest_words_to_bytes(got[i]) == hashlib.blake2s(m).digest()

    def test_transposed_kernel_matches_hashlib(self):
        # The structure-of-arrays kernel (batch in lanes, renamed
        # diagonals) must be digest-identical to hashlib across widths.
        for nbytes, W in [(64, 16), (32, 16), (192, 48)]:
            msgs = [bytes([rng.randrange(256) for _ in range(nbytes)])
                    for _ in range(17)]
            pad = 4 * W - nbytes
            words = jnp.asarray(np.stack(
                [bytes_to_digest_words(m + bytes(pad)) for m in msgs]))
            got = np.asarray(b2.blake2s_words_t(words, nbytes))
            for i, m in enumerate(msgs):
                assert digest_words_to_bytes(got[i]) == \
                    hashlib.blake2s(m).digest()

    def test_limbs_to_words_is_be_serialization(self):
        vals = rand_vals(16)
        limbs = jnp.asarray(ints_to_limbs(vals))
        words = np.asarray(b2.limbs_to_words(limbs))
        for i, v in enumerate(vals):
            assert digest_words_to_bytes(words[i]) == v.to_bytes(32, 'big')

    def test_words_to_limbs_roundtrip(self):
        vals = rand_vals(16)
        limbs = jnp.asarray(ints_to_limbs(vals))
        back = np.asarray(b2.words_to_limbs(b2.limbs_to_words(limbs)))
        assert limbs_to_ints(back) == vals


class TestMerkle:
    def test_root_matches_oracle_32B(self):
        vals = rand_vals(64)
        tree = mk.merkelize_limbs(jnp.asarray(ints_to_limbs(vals)))
        assert tree.root == omk.merkelize(vals)[1]

    def test_root_matches_oracle_96B(self):
        n = 32
        p, d, b = rand_vals(n), rand_vals(n), rand_vals(n)
        tree = mk.MerkleTree.from_pdb(*[jnp.asarray(ints_to_limbs(v))
                                        for v in (p, d, b)])
        leaves = [pv.to_bytes(32, 'big') + dv.to_bytes(32, 'big')
                  + bv.to_bytes(32, 'big') for pv, dv, bv in zip(p, d, b)]
        assert tree.root == omk.merkelize(leaves)[1]

    def test_branches_match_oracle(self):
        vals = rand_vals(128)
        tree = mk.merkelize_limbs(jnp.asarray(ints_to_limbs(vals)))
        otree = omk.merkelize(vals)
        idxs = [0, 1, 5, 127, 64]
        got = tree.branches(idxs)
        want = [omk.mk_branch(otree, i) for i in idxs]
        assert got == want
        for i, br in zip(idxs, got):
            assert omk.verify_branch(tree.root, i, br, output_as_int=True) == vals[i]


class TestNTT:
    def test_forward_matches_oracle(self):
        n = 256
        g = pow(7, (P - 1) // n, P)
        vals = rand_vals(n)
        dom = ntt_mod.get_domain(n, g)
        got = limbs_to_ints(np.asarray(
            ntt_mod.ntt(jnp.asarray(ints_to_limbs(vals)), dom)))
        assert got == oracle_fft(vals, P, g)

    def test_inverse_matches_oracle(self):
        n = 128
        g = pow(7, (P - 1) // n, P)
        vals = rand_vals(n)
        dom = ntt_mod.get_domain(n, g)
        got = limbs_to_ints(np.asarray(
            ntt_mod.ntt(jnp.asarray(ints_to_limbs(vals)), dom, inverse=True)))
        assert got == oracle_fft(vals, P, g, inv=True)

    def test_lde_matches_oracle(self):
        steps, blowup = 64, 8
        n = steps * blowup
        g2 = pow(7, (P - 1) // n, P)
        g1 = pow(g2, blowup, P)
        trace = rand_vals(steps)
        d1 = ntt_mod.get_domain(steps, g1)
        d2 = ntt_mod.get_domain(n, g2)
        evals, coeffs = ntt_mod.lde(jnp.asarray(ints_to_limbs(trace)), d1, d2)
        ocoeffs = oracle_fft(trace, P, g1, inv=True)
        assert limbs_to_ints(np.asarray(coeffs)) == ocoeffs
        assert limbs_to_ints(np.asarray(evals)) == oracle_fft(ocoeffs, P, g2)

    def test_roundtrip(self):
        n = 512
        g = pow(7, (P - 1) // n, P)
        vals = rand_vals(n)
        dom = ntt_mod.get_domain(n, g)
        x = jnp.asarray(ints_to_limbs(vals))
        back = ntt_mod.ntt(ntt_mod.ntt(x, dom), dom, inverse=True)
        assert limbs_to_ints(np.asarray(back)) == vals
