"""Pallas 256-bit field kernels, limb-major layout (round-3 proven).

The XLA limb kernels (ops/limbs.py) are HBM-bandwidth-bound: XLA
materializes most of the ~80 intermediate arrays of the schoolbook
mul+fold per call. These Pallas kernels keep the whole computation in
VMEM — one read of each operand block, one write of the result.

MEASURED on the v5e (scripts/exp_pmul.py / exp_pntt.py, K-chained,
floor-subtracted, digest-exact vs ops/limbs.py):

  - modmul:              3.09e9 modmul/s at 2^20   (70x fl.mul)
  - full DIF butterfly:  0.21 ms per 2^20-point stage (~4 ms/20-stage
                         NTT vs 180 ms for the XLA scan form)
  - [N,16] <-> [16,N] boundary transpose: free (below timing noise)

Layout: limb-major [16, N] uint32 (each limb row is a clean
[8, 128]-tileable vector). `to_limb_major` / `from_limb_major` convert
at the boundary. Kernels are exercised by tests/test_plimbs.py (Pallas
interpret mode on CPU; compiled on TPU). Prover integration is the
round-4 path to >100x (BASELINE.md "Proven next step").
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

from . import limbs as fl

NL = 16
_MASK = np.uint32(0xFFFF)
_C0, _C1, _C2 = [np.uint32(x) for x in fl._C3]
_P = [np.uint32(x) for x in fl.P_LIMBS]


def to_limb_major(x):
    """[N, 16] -> [16, N]."""
    return jnp.transpose(x)


def from_limb_major(x):
    """[16, N] -> [N, 16]."""
    return jnp.transpose(x)


def _propagate(cs, zero):
    out = []
    carry = zero
    for c in cs:
        t = c + carry
        out.append(t & _MASK)
        carry = t >> 16
    return out, carry


def _cond_sub_p(g, zero):
    borrow = zero
    d = []
    for i in range(NL):
        t = g[i] + _MASK + np.uint32(1) - _P[i] - borrow
        d.append(t & _MASK)
        borrow = np.uint32(1) - (t >> 16)
    ge = borrow == 0
    return [jnp.where(ge, d[i], g[i]) for i in range(NL)]


def _mul_lanes(a, b, zero):
    """Canonical modular product of two 16-lane-vector limb lists."""
    cols = [zero] * 32
    for i in range(NL):
        for j in range(NL):
            p = a[i] * b[j]
            cols[i + j] = cols[i + j] + (p & _MASK)
            cols[i + j + 1] = cols[i + j + 1] + (p >> 16)
    w, _ = _propagate(cols, zero)

    # fold 1: lo + hi*c (c = 351*2^32 - 1, 3 limbs), 20 columns
    f = [zero] * 20
    for i in range(NL):
        f[i] = w[i]
    for i in range(NL):
        h = w[NL + i]
        for k, cc in enumerate((_C0, _C1, _C2)):
            p = cc * h
            f[i + k] = f[i + k] + (p & _MASK)
            f[i + k + 1] = f[i + k + 1] + (p >> 16)
    f, _ = _propagate(f, zero)

    # fold 2: 16+4 -> 16 limbs, then final tiny carry fold
    g = [f[i] for i in range(NL)]
    for i in range(4):
        h = f[NL + i]
        for k, cc in enumerate((_C0, _C1, _C2)):
            p = cc * h
            g[i + k] = g[i + k] + (p & _MASK)
            g[i + k + 1] = g[i + k + 1] + (p >> 16)
    g, carry = _propagate(g, zero)
    g[0] = g[0] + carry * _C0
    g[1] = g[1] + carry * _C1
    g[2] = g[2] + carry * _C2
    g, _ = _propagate(g, zero)
    return _cond_sub_p(g, zero)


def _add_lanes(a, b, zero):
    out, carry = _propagate([a[i] + b[i] for i in range(NL)], zero)
    out[0] = out[0] + carry * _C0
    out[1] = out[1] + carry * _C1
    out[2] = out[2] + carry * _C2
    out, _ = _propagate(out, zero)
    return _cond_sub_p(out, zero)


def _sub_lanes(a, b, zero):
    borrow = zero
    d = []
    for i in range(NL):
        t = a[i] + _MASK + np.uint32(1) - b[i] - borrow
        d.append(t & _MASK)
        borrow = np.uint32(1) - (t >> 16)
    ge = borrow == 0
    borrow2 = zero
    d2 = []
    cl = (_C0, _C1, _C2)
    for i in range(NL):
        ci = cl[i] if i < 3 else np.uint32(0)
        t = d[i] + _MASK + np.uint32(1) - ci - borrow2
        d2.append(t & _MASK)
        borrow2 = np.uint32(1) - (t >> 16)
    return [jnp.where(ge, d[i], d2[i]) for i in range(NL)]


def _rows(ref):
    return [ref[i, :] for i in range(NL)]


def _write(ref, rows):
    for i in range(NL):
        ref[i, :] = rows[i]


def _mul_kernel(a_ref, b_ref, o_ref):
    a, b = _rows(a_ref), _rows(b_ref)
    _write(o_ref, _mul_lanes(a, b, jnp.zeros_like(a[0])))


def _dif_kernel(a_ref, b_ref, tw_ref, u_ref, v_ref):
    a, b, tw = _rows(a_ref), _rows(b_ref), _rows(tw_ref)
    zero = jnp.zeros_like(a[0])
    _write(u_ref, _add_lanes(a, b, zero))
    _write(v_ref, _mul_lanes(_sub_lanes(a, b, zero), tw, zero))


def _interpret() -> bool:
    # Compiled Mosaic kernels require a real TPU; the CPU test backend
    # runs the same kernels in Pallas interpret mode (bit-identical).
    return jax.default_backend() == "cpu"


@functools.partial(jax.jit, static_argnames=("blk",))
def mul_t(a_t, b_t, blk: int = 2048):
    """(a * b) mod p on limb-major [16, N] operands."""
    n = a_t.shape[1]
    blk = min(blk, n)
    return pl.pallas_call(
        _mul_kernel,
        out_shape=jax.ShapeDtypeStruct((NL, n), jnp.uint32),
        grid=(n // blk,),
        in_specs=[pl.BlockSpec((NL, blk), lambda i: (0, i))] * 2,
        out_specs=pl.BlockSpec((NL, blk), lambda i: (0, i)),
        interpret=_interpret(),
    )(a_t, b_t)


@functools.partial(jax.jit, static_argnames=("blk",))
def dif_stage_t(a_t, b_t, tw_t, blk: int = 2048):
    """One DIF butterfly: u = a + b, v = (a - b) * tw; [16, N] each."""
    n = a_t.shape[1]
    blk = min(blk, n)
    return pl.pallas_call(
        _dif_kernel,
        out_shape=(jax.ShapeDtypeStruct((NL, n), jnp.uint32),
                   jax.ShapeDtypeStruct((NL, n), jnp.uint32)),
        grid=(n // blk,),
        in_specs=[pl.BlockSpec((NL, blk), lambda i: (0, i))] * 3,
        out_specs=(pl.BlockSpec((NL, blk), lambda i: (0, i)),
                   pl.BlockSpec((NL, blk), lambda i: (0, i))),
        interpret=_interpret(),
    )(a_t, b_t, tw_t)
