"""Device transcript vs host transcript: bit-for-bit parity."""

import hashlib
import random

import numpy as np
import jax.numpy as jnp

from starks_tpu import transcript as ht
from starks_tpu.ops import transcript_dev as dt
from starks_tpu.ops import blake2s as b2
from starks_tpu.ops import limbs as fl
from starks_tpu.utils.conversions import limbs_to_ints


def _root_words(root: bytes):
    return jnp.asarray(np.frombuffer(root, dtype='<u4').astype(np.uint32))


def _rand_root(rng):
    return hashlib.blake2s(rng.randbytes(16)).digest()


class TestDeviceTranscript:
    def test_special_x(self):
        rng = random.Random(0)
        for _ in range(5):
            root = _rand_root(rng)
            want = ht.special_x(root)
            got = limbs_to_ints(np.asarray(
                dt.special_x_limbs(_root_words(root))[None]))[0]
            assert got == want

    def test_challenge(self):
        rng = random.Random(1)
        for j in (1, 2, 3, 4, 17):
            root = _rand_root(rng)
            want = ht.challenge_int(root, j) % fl.MODULUS
            got = limbs_to_ints(np.asarray(
                dt.challenge_limbs(_root_words(root), j)[None]))[0]
            assert got == want

    def test_pseudorandom_indices(self):
        rng = random.Random(2)
        for count, modulus, ex in [(40, 2**14, 0), (40, 2**14, 8),
                                   (80, 2**16, 8), (80, 2**19, 8),
                                   (3, 64, 4)]:
            root = _rand_root(rng)
            want = ht.pseudorandom_indices(root, modulus, count,
                                           exclude_multiples_of=ex)
            got = np.asarray(dt.pseudorandom_indices_dev(
                _root_words(root), modulus, count,
                exclude_multiples_of=ex)).tolist()
            assert got == want, (count, modulus, ex)

    def test_lincomb_coeffs(self):
        rng = random.Random(3)
        from starks_tpu.utils.conversions import ints_to_limbs
        p = fl.MODULUS
        k1, k2 = rng.randrange(p), rng.randrange(p)
        hs = [rng.randrange(p) for _ in range(8)]
        want = [(k1 + k2 * h) % p for h in hs]
        got = limbs_to_ints(np.asarray(dt.lincomb_coeffs(
            jnp.asarray(ints_to_limbs([k1]))[0],
            jnp.asarray(ints_to_limbs([k2]))[0],
            jnp.asarray(ints_to_limbs(hs)))))
        assert got == want
