"""Pallas NTT butterfly stage + layout-transpose cost (round 3).

exp_pmul measured the Pallas modmul at 3.09e9 modmul/s (70x the XLA
form — XLA materializes every intermediate in HBM; Pallas keeps the
schoolbook in VMEM). This measures the two things an NTT integration
needs: (a) a full DIF butterfly stage as one Pallas kernel in
limb-major [16, N] layout, (b) the [N,16] <-> [16,N] transpose cost at
the boundary.
"""

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
from starks_tpu.ops import limbs as fl, fused
from starks_tpu.utils import timing
from starks_tpu.utils.conversions import ints_to_limbs

NL = 16
MASK = np.uint32(0xFFFF)
C0, C1, C2 = [np.uint32(x) for x in fl._C3]
P_LIMBS = [np.uint32(x) for x in fl.P_LIMBS]


def _modmul_lanes(a, b, zero):
    """a, b: lists of 16 [blk] vectors -> canonical product limbs."""
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

    w, _ = propagate(cols)
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
    g = [f[i] for i in range(NL)]
    for i in range(4):
        h = f[NL + i]
        for k, cc in enumerate((C0, C1, C2)):
            p = cc * h
            g[i + k] = g[i + k] + (p & MASK)
            g[i + k + 1] = g[i + k + 1] + (p >> 16)
    g, carry = propagate(g)
    g[0] = g[0] + carry * C0
    g[1] = g[1] + carry * C1
    g[2] = g[2] + carry * C2
    g, _ = propagate(g)
    borrow = zero
    d = []
    for i in range(NL):
        t = g[i] + MASK + np.uint32(1) - P_LIMBS[i] - borrow
        d.append(t & MASK)
        borrow = np.uint32(1) - (t >> 16)
    ge = borrow == 0
    return [jnp.where(ge, d[i], g[i]) for i in range(NL)]


def _modadd_lanes(a, b, zero):
    carry = zero
    out = []
    for i in range(NL):
        t = a[i] + b[i] + carry
        out.append(t & MASK)
        carry = t >> 16
    # + carry * c (2^256 ≡ c)
    out[0] = out[0] + carry * C0
    out[1] = out[1] + carry * C1
    out[2] = out[2] + carry * C2
    carry = zero
    out2 = []
    for i in range(NL):
        t = out[i] + carry
        out2.append(t & MASK)
        carry = t >> 16
    borrow = zero
    d = []
    for i in range(NL):
        t = out2[i] + MASK + np.uint32(1) - P_LIMBS[i] - borrow
        d.append(t & MASK)
        borrow = np.uint32(1) - (t >> 16)
    ge = borrow == 0
    return [jnp.where(ge, d[i], out2[i]) for i in range(NL)]


def _modsub_lanes(a, b, zero):
    borrow = zero
    d = []
    for i in range(NL):
        t = a[i] + MASK + np.uint32(1) - b[i] - borrow
        d.append(t & MASK)
        borrow = np.uint32(1) - (t >> 16)
    ge = borrow == 0                   # a >= b
    # a < b: subtract c (== add p - 2^256)
    borrow2 = zero
    d2 = []
    cl = (C0, C1, C2)
    for i in range(NL):
        ci = cl[i] if i < 3 else np.uint32(0)
        t = d[i] + MASK + np.uint32(1) - ci - borrow2
        d2.append(t & MASK)
        borrow2 = np.uint32(1) - (t >> 16)
    return [jnp.where(ge, d[i], d2[i]) for i in range(NL)]


def _dif_stage_kernel(a_ref, b_ref, tw_ref, u_ref, v_ref):
    """u = a + b; v = (a - b) * tw, all [16, blk] limb-major."""
    a = [a_ref[i, :] for i in range(NL)]
    b = [b_ref[i, :] for i in range(NL)]
    tw = [tw_ref[i, :] for i in range(NL)]
    zero = jnp.zeros_like(a[0])
    u = _modadd_lanes(a, b, zero)
    amb = _modsub_lanes(a, b, zero)
    v = _modmul_lanes(amb, tw, zero)
    for i in range(NL):
        u_ref[i, :] = u[i]
        v_ref[i, :] = v[i]


def pallas_dif_stage(a_t, b_t, tw_t, blk=2048):
    n = a_t.shape[1]
    return pl.pallas_call(
        _dif_stage_kernel,
        out_shape=(jax.ShapeDtypeStruct((NL, n), jnp.uint32),
                   jax.ShapeDtypeStruct((NL, n), jnp.uint32)),
        grid=(n // blk,),
        in_specs=[pl.BlockSpec((NL, blk), lambda i: (0, i))] * 3,
        out_specs=(pl.BlockSpec((NL, blk), lambda i: (0, i)),
                   pl.BlockSpec((NL, blk), lambda i: (0, i))),
    )(a_t, b_t, tw_t)


report = {}

# correctness vs fl kernels
import random
r = random.Random(9)
n_small = 2048
av = [r.randrange(fl.MODULUS) for _ in range(n_small)]
bv = [r.randrange(fl.MODULUS) for _ in range(n_small)]
tv = [r.randrange(fl.MODULUS) for _ in range(n_small)]
a_s = jnp.asarray(ints_to_limbs(av))
b_s = jnp.asarray(ints_to_limbs(bv))
t_s = jnp.asarray(ints_to_limbs(tv))
want_u = np.asarray(jax.jit(fl.add)(a_s, b_s))
want_v = np.asarray(jax.jit(fl.mul)(jax.jit(fl.sub)(a_s, b_s), t_s))
got_u, got_v = pallas_dif_stage(a_s.T.copy(), b_s.T.copy(), t_s.T.copy(),
                                blk=1024)
ok = (np.array_equal(np.asarray(got_u).T, want_u)
      and np.array_equal(np.asarray(got_v).T, want_v))
print("pallas dif stage correct:", bool(ok), flush=True)
report["stage_correct"] = bool(ok)
assert ok

# speed: one full butterfly stage at 2^19 pairs (= 2^20-point stage)
N2 = 2 ** 19
rng = np.random.default_rng(13)
at = jnp.asarray(rng.integers(0, 2 ** 16, (NL, N2), dtype=np.uint32))
bt = jnp.asarray(rng.integers(0, 2 ** 16, (NL, N2), dtype=np.uint32))
twt = jnp.asarray(rng.integers(0, 2 ** 16, (NL, N2), dtype=np.uint32))
K = 16
floor = timing.transfer_floor()


def chain(x, y, tw):
    for _ in range(K):
        x, y = pallas_dif_stage(x, y, tw)
    return x


t, _ = timing.timed(jax.jit(chain), at, bt, twt, reps=3)
per = (t - floor) / K
report["stage_per_s"] = per
report["stage_points_per_s"] = 2 * N2 / per
print(f"pallas stage (2^20-pt): {per*1e3:.2f} ms -> "
      f"20-stage NTT est {per*20*1e3:.0f} ms", flush=True)

# transpose cost [N,16] <-> [16,N] at 2^20
x = jnp.asarray(rng.integers(0, 2 ** 16, (2 ** 20, 16), dtype=np.uint32))
f_t = jax.jit(lambda v: jnp.transpose(v))
t, _ = timing.timed(f_t, x, reps=3)
report["transpose_2e20_s"] = t - floor
print(f"transpose [2^20,16]->[16,2^20]: {(t-floor)*1e3:.2f} ms", flush=True)

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "exp_pntt.json"), "w") as fh:
    json.dump(report, fh, indent=2)
