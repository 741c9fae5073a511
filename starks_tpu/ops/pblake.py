"""Pallas blake2s-256: whole Merkle levels hashed at VPU speed-of-light.

The XLA formulations in ops/blake2s.py bottom out at ~0.1% of roofline:
the ~1120-op compression chain exceeds XLA's fusion windows, so every
few ops round-trip through HBM. This kernel keeps the entire
compression in VMEM registers: messages arrive TRANSPOSED as
[W, M/128, 128] so each of the 16 state words is an (8, 128) uint32
tile (1024 independent messages per grid step, full lane utilization,
zero data movement in the diagonal pass — it is pure variable
renaming). One grid step reads 64*W bytes/msg and writes 32, so HBM
traffic is the information-theoretic minimum.

Digest-identical to `hashlib.blake2s` (tests/test_ops.py) and to the
XLA forms. Interpret mode makes the same kernel runnable on CPU for
tests; production CPU paths keep the XLA row form (see
fused._tree_hasher).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .blake2s import IV, SIGMA, _PARAM0

_ROWS = 8          # sublanes per grid step
_LANES = 128
_BLOCK_MSGS = _ROWS * _LANES


def _rotr(x, n):
    return (x >> n) | (x << (32 - n))


def _g(v, a, b, c, d, x, y):
    va, vb, vc, vd = v[a], v[b], v[c], v[d]
    va = va + vb + x
    vd = _rotr(vd ^ va, 16)
    vc = vc + vd
    vb = _rotr(vb ^ vc, 12)
    va = va + vb + y
    vd = _rotr(vd ^ va, 8)
    vc = vc + vd
    vb = _rotr(vb ^ vc, 7)
    v[a], v[b], v[c], v[d] = va, vb, vc, vd


def _kernel(m_ref, out_ref, *, nblocks: int, total_bytes: int):
    shape = (_ROWS, _LANES)
    h = [jnp.full(shape, np.uint32(IV[0] ^ _PARAM0), jnp.uint32)]
    for k in range(1, 8):
        h.append(jnp.full(shape, np.uint32(IV[k]), jnp.uint32))

    for blk in range(nblocks):
        final = blk == nblocks - 1
        t = np.uint32(total_bytes if final else 64 * (blk + 1))
        fmask = np.uint32(0xFFFFFFFF if final else 0)
        m = [m_ref[16 * blk + i] for i in range(16)]
        v = list(h)
        for k in range(4):
            v.append(jnp.full(shape, np.uint32(IV[k]), jnp.uint32))
        v.append(jnp.full(shape, np.uint32(IV[4] ^ t), jnp.uint32))
        v.append(jnp.full(shape, np.uint32(IV[5]), jnp.uint32))
        v.append(jnp.full(shape, np.uint32(IV[6] ^ fmask), jnp.uint32))
        v.append(jnp.full(shape, np.uint32(IV[7]), jnp.uint32))

        for r in range(10):
            s = SIGMA[r]
            _g(v, 0, 4, 8, 12, m[s[0]], m[s[1]])
            _g(v, 1, 5, 9, 13, m[s[2]], m[s[3]])
            _g(v, 2, 6, 10, 14, m[s[4]], m[s[5]])
            _g(v, 3, 7, 11, 15, m[s[6]], m[s[7]])
            _g(v, 0, 5, 10, 15, m[s[8]], m[s[9]])
            _g(v, 1, 6, 11, 12, m[s[10]], m[s[11]])
            _g(v, 2, 7, 8, 13, m[s[12]], m[s[13]])
            _g(v, 3, 4, 9, 14, m[s[14]], m[s[15]])

        h = [h[i] ^ v[i] ^ v[i + 8] for i in range(8)]

    for i in range(8):
        out_ref[i] = h[i]


@functools.partial(jax.jit, static_argnames=("total_bytes", "interpret"))
def blake2s_words_pl(m, total_bytes: int, interpret: bool = False):
    """blake2s-256 of [M, W] uint32 LE word messages (W a 16-word
    multiple, zero-padded past total_bytes). Returns [M, 8] digests.
    Drop-in digest-compatible with blake2s.blake2s_words."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, W = m.shape
    assert W % 16 == 0 and W * 4 >= total_bytes
    nblocks = W // 16

    Mp = -(-M // _BLOCK_MSGS) * _BLOCK_MSGS
    if Mp != M:
        m = jnp.concatenate(
            [m, jnp.zeros((Mp - M, W), jnp.uint32)], axis=0)
    # [M, W] -> [W, M/128, 128]: word-major, messages along (sublane,
    # lane) tiles.
    mt = m.T.reshape(W, Mp // _LANES, _LANES)

    grid = (Mp // _BLOCK_MSGS,)
    out = pl.pallas_call(
        functools.partial(_kernel, nblocks=nblocks,
                          total_bytes=total_bytes),
        out_shape=jax.ShapeDtypeStruct((8, Mp // _LANES, _LANES),
                                       jnp.uint32),
        grid=grid,
        in_specs=[pl.BlockSpec((W, _ROWS, _LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, _ROWS, _LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(mt)
    # [8, M/128, 128] -> [M, 8]
    return out.reshape(8, Mp).T[:M]
