"""Batched blake2s-256 on the TPU VPU.

TPU-native replacement for the reference's `hashlib.blake2s` calls inside
sequential Merkle builds (`starks/merkle_tree.py`, SURVEY.md §4.5):
blake2s is pure 32-bit word arithmetic (add / xor / rotr), a perfect fit
for uint32 lanes — here each LANE hashes an independent message, so one
call hashes an entire Merkle level (SURVEY §8 Phase 3).

Message/digest words follow blake2s' little-endian convention; field
elements are serialized to 32-byte BIG-endian leaves per SURVEY §A.4 —
`limbs_to_words` performs exactly that reordering on device, so device
digests match `hashlib.blake2s` on the reference's byte strings
digest-for-digest (tested in tests/test_blake2s.py).
"""

import jax.numpy as jnp
import numpy as np

IV = np.array([0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
               0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19], np.uint32)

# Parameter word for: digest_length=32, key=0, fanout=1, depth=1.
_PARAM0 = np.uint32(0x01010020)

SIGMA = np.array([
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
    [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
    [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
    [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
    [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
    [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
    [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
    [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
    [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
], np.int32)


def _rotr(x, n):
    return (x >> n) | (x << (32 - n))


def _g_vec(a, b, c, d, x, y):
    """The blake2s G mixing function on 4-lane row vectors."""
    a = a + b + x
    d = _rotr(d ^ a, 16)
    c = c + d
    b = _rotr(b ^ c, 12)
    a = a + b + y
    d = _rotr(d ^ a, 8)
    c = c + d
    b = _rotr(b ^ c, 7)
    return a, b, c, d


# Per-round message-word lane gathers for the SIMD row formulation.
_COL_X = SIGMA[:, 0:8:2]
_COL_Y = SIGMA[:, 1:8:2]
_DIAG_X = SIGMA[:, 8:16:2]
_DIAG_Y = SIGMA[:, 9:16:2]


def compress(h, m, t, final: bool):
    """One blake2s compression, vectorized over leading dims.

    SIMD row formulation (the shape XLA compiles well and the VPU likes):
    the 4x4 state matrix lives as four [..., 4] rows; the column G pass
    runs all 4 columns at once and the diagonal pass is a lane rotation
    away. h: [..., 8] state words; m: [..., 16] message words; t: bytes
    hashed through this block — a TRACED uint32 scalar, so one compiled
    kernel serves every block position (multi-block compile cost was
    super-linear otherwise); final: last-block flag (static).
    """
    batch = h.shape[:-1]
    t = jnp.asarray(t, jnp.uint32)
    r0 = h[..., 0:4]
    r1 = h[..., 4:8]
    r2 = jnp.broadcast_to(jnp.asarray(IV[0:4]), batch + (4,))
    fmask = np.uint32(0xFFFFFFFF if final else 0)
    r3c = jnp.asarray(IV[4:8]) ^ jnp.stack(
        [t, jnp.uint32(0), fmask, jnp.uint32(0)])
    r3 = jnp.broadcast_to(r3c, batch + (4,))

    for r in range(10):
        r0, r1, r2, r3 = _g_vec(r0, r1, r2, r3,
                                m[..., _COL_X[r]], m[..., _COL_Y[r]])
        # Diagonalize: column j now holds (v_j, v_{j+4+1}, v_{j+8+2}, ...).
        r1 = jnp.roll(r1, -1, axis=-1)
        r2 = jnp.roll(r2, -2, axis=-1)
        r3 = jnp.roll(r3, -3, axis=-1)
        r0, r1, r2, r3 = _g_vec(r0, r1, r2, r3,
                                m[..., _DIAG_X[r]], m[..., _DIAG_Y[r]])
        r1 = jnp.roll(r1, 1, axis=-1)
        r2 = jnp.roll(r2, 2, axis=-1)
        r3 = jnp.roll(r3, 3, axis=-1)

    return jnp.concatenate([h[..., 0:4] ^ r0 ^ r2,
                            h[..., 4:8] ^ r1 ^ r3], axis=-1)


def _h0(batch_shape):
    h = np.tile(IV, batch_shape + (1,)) if batch_shape else IV.copy()
    h = jnp.asarray(h)
    return h.at[..., 0].set(h[..., 0] ^ _PARAM0)


import functools
import jax

_compress_jit = functools.partial(jax.jit, static_argnames=("final",))(compress)


def blake2s_words(m, total_bytes: int):
    """blake2s-256 of messages given as [..., W] uint32 LE words, where
    W = ceil(total_bytes/4) rounded up to a 16-word multiple by the caller
    (zero-padded). Returns [..., 8] digest words.

    Python-loops the blocks; when called EAGERLY each block is one jitted
    compress (the compile-friendly path for wide leaves); when traced
    inside an outer jit the loop inlines as before — keep outer jits to
    <= 3 blocks."""
    nwords = m.shape[-1]
    assert nwords % 16 == 0 and nwords * 4 >= total_bytes
    assert total_bytes < 2**32
    nblocks = nwords // 16
    h = _h0(m.shape[:-1])
    for blk in range(nblocks):
        final = blk == nblocks - 1
        t = total_bytes if final else 64 * (blk + 1)
        h = _compress_jit(h, m[..., blk * 16:(blk + 1) * 16],
                          np.uint32(t), final)
    return h


# ---------------------------------------------------------------------------
# Transposed (structure-of-arrays) formulation: each of the 16 state
# words is its own [batch] array, so the VPU vectorizes across MESSAGES
# with full lane utilization and the 4x4 diagonalization is pure Python
# variable renaming (zero data movement). The row formulation above
# keeps batch on sublanes and words on lanes (4/128 used) and pays two
# lane-rolls per round — measured ~0.7 us/hash; this one is the hot-path
# form used by the fused prover's Merkle levels.
# ---------------------------------------------------------------------------

def _g_t(v, a, b, c, d, x, y):
    """G on scalar-per-message arrays (state list v indexed in place)."""
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


def compress_t(h_cols, m_cols, t, final: bool):
    """One blake2s compression on transposed operands.

    h_cols: list of 8 [batch] uint32 arrays; m_cols: list of 16 [batch]
    arrays; t: traced uint32 scalar (bytes hashed through this block);
    final: static last-block flag. Returns 8 [batch] arrays."""
    batch = h_cols[0].shape
    t = jnp.asarray(t, jnp.uint32)
    v = list(h_cols)
    for k in range(4):
        v.append(jnp.broadcast_to(jnp.uint32(IV[k]), batch))
    v.append(jnp.broadcast_to(jnp.uint32(IV[4]) ^ t, batch))
    v.append(jnp.broadcast_to(jnp.uint32(IV[5]), batch))
    fmask = np.uint32(0xFFFFFFFF if final else 0)
    v.append(jnp.broadcast_to(jnp.uint32(IV[6]) ^ fmask, batch))
    v.append(jnp.broadcast_to(jnp.uint32(IV[7]), batch))

    for r in range(10):
        s = SIGMA[r]
        _g_t(v, 0, 4, 8, 12, m_cols[s[0]], m_cols[s[1]])
        _g_t(v, 1, 5, 9, 13, m_cols[s[2]], m_cols[s[3]])
        _g_t(v, 2, 6, 10, 14, m_cols[s[4]], m_cols[s[5]])
        _g_t(v, 3, 7, 11, 15, m_cols[s[6]], m_cols[s[7]])
        _g_t(v, 0, 5, 10, 15, m_cols[s[8]], m_cols[s[9]])
        _g_t(v, 1, 6, 11, 12, m_cols[s[10]], m_cols[s[11]])
        _g_t(v, 2, 7, 8, 13, m_cols[s[12]], m_cols[s[13]])
        _g_t(v, 3, 4, 9, 14, m_cols[s[14]], m_cols[s[15]])

    return [h_cols[i] ^ v[i] ^ v[i + 8] for i in range(8)]


def _h0_cols(batch):
    out = [jnp.broadcast_to(jnp.uint32(IV[0] ^ _PARAM0), batch)]
    for k in range(1, 8):
        out.append(jnp.broadcast_to(jnp.uint32(IV[k]), batch))
    return out


def blake2s_words_t(m, total_bytes: int):
    """blake2s-256 of [..., W] uint32 LE word messages via the transposed
    kernel. Same contract as `blake2s_words` (W a 16-word multiple,
    zero-padded); returns [..., 8] digest words."""
    nwords = m.shape[-1]
    assert nwords % 16 == 0 and nwords * 4 >= total_bytes
    nblocks = nwords // 16
    batch = m.shape[:-1]
    m_cols = [m[..., i] for i in range(nwords)]
    h = _h0_cols(batch)
    for blk in range(nblocks):
        final = blk == nblocks - 1
        t = total_bytes if final else 64 * (blk + 1)
        h = compress_t(h, m_cols[blk * 16:(blk + 1) * 16],
                       np.uint32(t), final)
    return jnp.stack(h, axis=-1)


def limbs_to_words(x):
    """[..., 16] field-element limbs -> [..., 8] message words equal to the
    32-byte BIG-endian serialization read as little-endian uint32 words
    (SURVEY §A.4 leaf format)."""
    rev = x[..., ::-1]
    hi16 = rev[..., 0::2]   # more-significant limb of each word
    lo16 = rev[..., 1::2]
    bs_hi = ((hi16 & 0xFF) << 8) | (hi16 >> 8)
    bs_lo = ((lo16 & 0xFF) << 8) | (lo16 >> 8)
    return bs_hi | (bs_lo << 16)


def words_to_limbs(w):
    """Inverse of limbs_to_words: [..., 8] words -> [..., 16] limbs."""
    bs_hi = w & 0xFFFF
    bs_lo = w >> 16
    hi16 = ((bs_hi & 0xFF) << 8) | (bs_hi >> 8)
    lo16 = ((bs_lo & 0xFF) << 8) | (bs_lo >> 8)
    out = jnp.stack([hi16, lo16], axis=-1).reshape(w.shape[:-1] + (16,))
    return out[..., ::-1]


def hash_pairs_words(words2):
    """Hash [..., 16] words (two concatenated 32-byte children) -> [..., 8].
    The Merkle inner-node combine: blake2s of exactly 64 bytes."""
    return blake2s_words(words2, 64)


def hash_pairs_96B(words48):
    """Hash [..., 48] words (two concatenated 96-byte P||D||B leaves):
    blake2s of 192 bytes = 3 full blocks."""
    return blake2s_words(words48, 192)
