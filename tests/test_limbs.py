"""Limb field arithmetic vs Python bigint ground truth (SURVEY §8 Phase 1:
'validate against oracle on millions of random cases' — here a dense random
sweep incl. adversarial boundary values)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starks_tpu.ops import limbs as fl
from starks_tpu.utils.conversions import ints_to_limbs, limbs_to_ints

P = fl.MODULUS
rng = random.Random(7)

# Adversarial values around the modulus / powers of two / small ints.
EDGE = [0, 1, 2, 3, P - 1, P - 2, (P - 1) // 2, 2**255, 2**128, 2**16 - 1,
        2**16, 2**255 + 2**33, 351 * 2**32 - 1, 351 * 2**32, P - 351 * 2**32]


def rand_vals(n):
    vals = EDGE + [rng.randrange(P) for _ in range(n - len(EDGE))]
    return vals[:n]


def dev(xs):
    return jnp.asarray(ints_to_limbs(xs))


class TestLimbOps:
    def test_roundtrip(self):
        vals = rand_vals(64)
        assert limbs_to_ints(np.asarray(dev(vals))) == vals

    def test_add(self):
        a, b = rand_vals(256), rand_vals(256)[::-1]
        got = limbs_to_ints(np.asarray(jax.jit(fl.add)(dev(a), dev(b))))
        assert got == [(x + y) % P for x, y in zip(a, b)]

    def test_sub(self):
        a, b = rand_vals(256), rand_vals(256)[::-1]
        got = limbs_to_ints(np.asarray(jax.jit(fl.sub)(dev(a), dev(b))))
        assert got == [(x - y) % P for x, y in zip(a, b)]

    def test_mul(self):
        a, b = rand_vals(512), rand_vals(512)[::-1]
        got = limbs_to_ints(np.asarray(jax.jit(fl.mul)(dev(a), dev(b))))
        assert got == [(x * y) % P for x, y in zip(a, b)]

    def test_mul_stress(self):
        n = 4096
        a = [rng.randrange(P) for _ in range(n)]
        b = [rng.randrange(P) for _ in range(n)]
        got = limbs_to_ints(np.asarray(jax.jit(fl.mul)(dev(a), dev(b))))
        assert got == [(x * y) % P for x, y in zip(a, b)]

    def test_cube(self):
        a = rand_vals(128)
        got = limbs_to_ints(np.asarray(jax.jit(fl.cube)(dev(a))))
        assert got == [pow(x, 3, P) for x in a]

    def test_pow_const(self):
        a = rand_vals(32)
        e = 0xDEADBEEF12345
        got = limbs_to_ints(np.asarray(jax.jit(
            lambda x: fl.pow_const(x, e))(dev(a))))
        assert got == [pow(x, e, P) for x in a]

    def test_inv(self):
        a = rand_vals(32)
        got = limbs_to_ints(np.asarray(jax.jit(fl.inv)(dev(a))))
        assert got == [pow(x, P - 2, P) if x else 0 for x in a]

    def test_batch_inv(self):
        a = rand_vals(128)
        a[5] = 0  # zero must map to zero
        got = limbs_to_ints(np.asarray(jax.jit(fl.batch_inv)(dev(a))))
        assert got == [pow(x, P - 2, P) if x else 0 for x in a]

    def test_powers_series(self):
        g = pow(7, (P - 1) // 64, P)
        got = limbs_to_ints(np.asarray(fl.powers_series(dev([g])[0], 64)))
        assert got == [pow(g, i, P) for i in range(64)]

    def test_neg(self):
        a = rand_vals(64)
        got = limbs_to_ints(np.asarray(jax.jit(fl.neg)(dev(a))))
        assert got == [(-x) % P for x in a]
