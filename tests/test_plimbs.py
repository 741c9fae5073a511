"""Pallas limb kernels (ops/plimbs.py) vs the XLA limb kernels.

On the CPU test backend the kernels run in Pallas interpret mode —
same math, bit-identical outputs (the compiled Mosaic path is the TPU
fast path, measured in scripts/exp_pmul.py / exp_pntt.py)."""

import random

import jax
import jax.numpy as jnp
import numpy as np

from starks_tpu.ops import limbs as fl
from starks_tpu.ops import plimbs
from starks_tpu.utils.conversions import ints_to_limbs


def _rand(n, seed):
    r = random.Random(seed)
    return jnp.asarray(ints_to_limbs(
        [r.randrange(fl.MODULUS) for _ in range(n)]))


class TestPallasLimbs:
    def test_mul_matches(self):
        n = 512
        a, b = _rand(n, 1), _rand(n, 2)
        want = np.asarray(jax.jit(fl.mul)(a, b))
        got = np.asarray(plimbs.from_limb_major(
            plimbs.mul_t(plimbs.to_limb_major(a),
                         plimbs.to_limb_major(b), blk=256)))
        assert np.array_equal(got, want)

    def test_mul_edge_values(self):
        vals = [0, 1, 2, fl.MODULUS - 1, fl.MODULUS - 2,
                2 ** 255, 2 ** 256 - 351 * 2 ** 32,  # == p - 1 + 0
                (1 << 240) - 1]
        pairs = [(x, y) for x in vals for y in vals]
        a = jnp.asarray(ints_to_limbs([x % fl.MODULUS for x, _ in pairs]))
        b = jnp.asarray(ints_to_limbs([y % fl.MODULUS for _, y in pairs]))
        want = np.asarray(jax.jit(fl.mul)(a, b))
        got = np.asarray(plimbs.from_limb_major(
            plimbs.mul_t(plimbs.to_limb_major(a),
                         plimbs.to_limb_major(b), blk=64)))
        assert np.array_equal(got, want)

    def test_dif_stage_matches(self):
        n = 256
        a, b, tw = _rand(n, 3), _rand(n, 4), _rand(n, 5)
        want_u = np.asarray(jax.jit(fl.add)(a, b))
        want_v = np.asarray(jax.jit(fl.mul)(jax.jit(fl.sub)(a, b), tw))
        u, v = plimbs.dif_stage_t(plimbs.to_limb_major(a),
                                  plimbs.to_limb_major(b),
                                  plimbs.to_limb_major(tw), blk=128)
        assert np.array_equal(np.asarray(plimbs.from_limb_major(u)),
                              want_u)
        assert np.array_equal(np.asarray(plimbs.from_limb_major(v)),
                              want_v)
