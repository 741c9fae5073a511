"""Pallas 256-bit modmul experiment (round 3).

fl.mul measures 44 M modmul/s at 2^20 (K-chained) — ~5x under the
ceiling-implied rate; variant tests showed depth doesn't matter, so the
cost is XLA materializing intermediates in HBM. A Pallas kernel keeps
the whole schoolbook+fold in VMEM by construction: one read of a/b,
one write of out per element.

Layout: limb-major [16, N] blocks (lanes along N) so each limb row is a
clean [8, 128]-tileable vector; the wrapper transposes at the boundary
(the transpose cost is measured separately — if the kernel wins big,
the framework can hold limb-major layouts natively).
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_axon"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from starks_tpu.ops import limbs as fl
from starks_tpu.utils import timing
from starks_tpu.utils.conversions import ints_to_limbs

NL = 16
MASK = np.uint32(0xFFFF)
C0, C1, C2 = [np.uint32(x) for x in fl._C3]
P_LIMBS = [np.uint32(x) for x in fl.P_LIMBS]


def _mul_kernel(a_ref, b_ref, o_ref):
    a = [a_ref[i, :] for i in range(NL)]
    b = [b_ref[i, :] for i in range(NL)]
    zero = jnp.zeros_like(a[0])

    # 32 columns of the 512-bit product, accumulated in VMEM.
    cols = [zero] * 32
    for i in range(NL):
        for j in range(NL):
            p = a[i] * b[j]
            cols[i + j] = cols[i + j] + (p & MASK)
            cols[i + j + 1] = cols[i + j + 1] + (p >> 16)

    def propagate(cs):
        out = []
        carry = zero
        for c in cs:
            t = c + carry
            out.append(t & MASK)
            carry = t >> 16
        return out, carry

    w, _ = propagate(cols)                      # 32 canonical limbs

    # fold 1: lo + hi * c over 20 columns (c = [C0, C1, C2] 3 limbs)
    f = [zero] * 20
    for i in range(NL):
        f[i] = w[i]
    for i in range(NL):
        h = w[NL + i]
        for k, cc in enumerate((C0, C1, C2)):
            p = cc * h
            f[i + k] = f[i + k] + (p & MASK)
            f[i + k + 1] = f[i + k + 1] + (p >> 16)
    f, _ = propagate(f)

    # fold 2: 16 + 4 -> 16 limbs (+ final carry folds once more)
    g = [f[i] for i in range(NL)]
    for i in range(4):
        h = f[NL + i]
        for k, cc in enumerate((C0, C1, C2)):
            p = cc * h
            g[i + k] = g[i + k] + (p & MASK)
            if i + k + 1 < NL:
                g[i + k + 1] = g[i + k + 1] + (p >> 16)
    g, carry = propagate(g)
    # carry * c (carry tiny)
    g[0] = g[0] + carry * C0
    g[1] = g[1] + carry * C1
    g[2] = g[2] + carry * C2
    g, _ = propagate(g)

    # conditional subtract p (g < 2p)
    borrow = zero
    d = []
    for i in range(NL):
        t = g[i] + MASK + np.uint32(1) - P_LIMBS[i] - borrow
        d.append(t & MASK)
        borrow = np.uint32(1) - (t >> 16)
    ge = borrow == 0
    for i in range(NL):
        o_ref[i, :] = jnp.where(ge, d[i], g[i])


def pallas_mul_t(a_t, b_t, blk=2048):
    """a_t, b_t: [16, N] limb-major uint32."""
    n = a_t.shape[1]
    return pl.pallas_call(
        _mul_kernel,
        out_shape=jax.ShapeDtypeStruct((NL, n), jnp.uint32),
        grid=(n // blk,),
        in_specs=[pl.BlockSpec((NL, blk), lambda i: (0, i)),
                  pl.BlockSpec((NL, blk), lambda i: (0, i))],
        out_specs=pl.BlockSpec((NL, blk), lambda i: (0, i)),
    )(a_t, b_t)


# --- correctness ---------------------------------------------------------
import random
r = random.Random(5)
n_small = 4096
av = [r.randrange(fl.MODULUS) for _ in range(n_small)]
bv = [r.randrange(fl.MODULUS) for _ in range(n_small)]
a_s = jnp.asarray(ints_to_limbs(av))
b_s = jnp.asarray(ints_to_limbs(bv))
want = np.asarray(jax.jit(fl.mul)(a_s, b_s))
got = np.asarray(pallas_mul_t(a_s.T.copy(), b_s.T.copy(), blk=1024)).T
ok = bool(np.array_equal(got, want))
print("pallas mul correct:", ok, flush=True)
assert ok

# --- speed ---------------------------------------------------------------
N = 2 ** 20
rng = np.random.default_rng(11)
a = jnp.asarray(rng.integers(0, 2 ** 16, (NL, N), dtype=np.uint32))
b = jnp.asarray(rng.integers(0, 2 ** 16, (NL, N), dtype=np.uint32))
K = 32
floor = timing.transfer_floor()


def chain(x, y):
    for _ in range(K):
        x = pallas_mul_t(x, y)
    return x


t, _ = timing.timed(jax.jit(chain), a, b, reps=3)
per = (t - floor) / K
print(f"pallas: {per*1e3:.2f} ms/mul -> {N/per/1e6:.1f} M modmul/s",
      flush=True)

report = {"floor_s": floor, "per_mul_s": per, "modmul_per_s": N / per,
          "correct": ok}
with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "exp_pmul.json"), "w") as fh:
    json.dump(report, fh, indent=2)
