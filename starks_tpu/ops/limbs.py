"""Vectorized 256-bit prime-field arithmetic in 16x16-bit limbs.

TPU-native replacement for the reference's scalar Python bigint field ops
(`starks/poly_utils.py :: PrimeField`, SURVEY.md §3.1). Design:

- A field element is 16 little-endian 16-bit limbs held in uint32 lanes,
  shape [..., 16]; arrays are batch-major so the VPU vectorizes across
  elements. 16x16-bit partial products fit exactly in uint32.
- Reduction exploits the STARK prime's sparsity (SURVEY §8 Phase 1):
  p = 2^256 - 351*2^32 + 1, so 2^256 ≡ c (mod p) with c = 351*2^32 - 1 a
  3-limb constant; a 512-bit product folds to 256 bits in two shifted
  multiply-adds by c. No Montgomery form — values stay canonical, so
  device bytes can feed the transcript hash directly (bit-exactness,
  SURVEY §A.4).
- Batch inversion mirrors `multi_inv` as prefix/suffix products via
  `jax.lax.associative_scan` plus ONE Fermat inversion.

Everything here is jit-compatible pure functions on uint32 arrays.
"""

import jax
import jax.numpy as jnp
import numpy as np

MODULUS = 2**256 - 351 * 2**32 + 1
NUM_LIMBS = 16
LIMB_BITS = 16
_MASK = np.uint32(0xFFFF)

# c = 2^256 mod p = 351*2^32 - 1, as 3 little-endian 16-bit limbs.
_C3 = np.array([0xFFFF, 0xFFFF, 0x015E], dtype=np.uint32)


def _int_to_limbs_np(x: int) -> np.ndarray:
    return np.frombuffer(x.to_bytes(32, 'little'), dtype='<u2').astype(np.uint32)


P_LIMBS = _int_to_limbs_np(MODULUS)
ONE = _int_to_limbs_np(1)
ZERO = np.zeros(NUM_LIMBS, dtype=np.uint32)
_C16 = np.zeros(NUM_LIMBS, dtype=np.uint32)
_C16[:3] = _C3


def _propagate(cols):
    """Carry-propagate columns (each < 2^31) into canonical 16-bit limbs.

    Returns (limbs, carry_out). Statically unrolled over the limb axis
    (<= 36 steps) — straight-line VPU code, no while-loop overhead on TPU —
    vectorized over the batch.
    """
    k = cols.shape[-1]
    carry = jnp.zeros_like(cols[..., 0])
    outs = []
    for i in range(k):
        t = cols[..., i] + carry
        outs.append(t & _MASK)
        carry = t >> LIMB_BITS
    return jnp.stack(outs, axis=-1), carry


def _borrow_sub(a, b):
    """(a - b) mod 2^(16K) via the add-complement trick.

    Returns (limbs, no_borrow) where no_borrow==1 iff a >= b.
    """
    cols = a + _MASK - b
    cols = cols.at[..., 0].add(1)
    return _propagate(cols)


def _add_c_times(limbs, carry):
    """limbs + carry*c, fully propagated (final carry provably zero)."""
    cols = limbs.at[..., 0:3].add(carry[..., None] * _C3)
    limbs2, carry2 = _propagate(cols)
    cols2 = limbs2.at[..., 0:3].add(carry2[..., None] * _C3)
    limbs3, _ = _propagate(cols2)
    return limbs3


def _cond_sub_p(limbs):
    d, ge = _borrow_sub(limbs, jnp.asarray(P_LIMBS))
    return jnp.where((ge == 1)[..., None], d, limbs)


def add(a, b):
    """(a + b) mod p, canonical in/out."""
    limbs, carry = _propagate(a + b)
    return _cond_sub_p(_add_c_times(limbs, carry))


def sub(a, b):
    """(a - b) mod p, canonical in/out."""
    d, ge = _borrow_sub(a, b)
    # a < b: result is a - b + 2^256; subtract c to get a - b + p.
    d2, _ = _borrow_sub(d, jnp.asarray(_C16))
    return jnp.where((ge == 1)[..., None], d, d2)


def neg(a):
    return sub(jnp.broadcast_to(jnp.asarray(ZERO), a.shape), a)


# Memory-lean tracing mode (see enable_lean_mul): when True, _mul_wide
# threads its accumulator through optimization_barriers so the XLA
# scheduler cannot co-materialize all 16 partial-product arrays. At the
# 2^23-point domain the default schedule keeps ~17 [N,16..32] temps
# live simultaneously (measured: 21.1 GB HBM demand, OOM); the barrier
# chain bounds the live set at ~3 temps. Costs some fusion freedom —
# only enabled for big-domain cores (prover._FusedSetup, plan.strided).
LEAN_MUL = False


class enable_lean_mul:
    """Context manager: trace mul() in the memory-lean form."""

    def __init__(self, on: bool = True):
        self.on = on

    def __enter__(self):
        global LEAN_MUL
        self.prev = LEAN_MUL
        LEAN_MUL = self.on

    def __exit__(self, *exc):
        global LEAN_MUL
        LEAN_MUL = self.prev


def _mul_wide(a, b):
    """Schoolbook 16x16 -> 32-limb (512-bit) product, canonical limbs.

    Shifted accumulation keeps the working set at [batch, 32] (no
    [batch,16,16] materialization); column sums < 2^21 fit uint32.
    """
    lean = LEAN_MUL
    acc = None
    for i in range(NUM_LIMBS):
        part = a[..., i:i + 1] * b          # exact in uint32
        pad = [(0, 0)] * (part.ndim - 1)
        lo = jnp.pad(part & _MASK, pad + [(i, NUM_LIMBS - i)])
        hi = jnp.pad(part >> LIMB_BITS, pad + [(i + 1, NUM_LIMBS - 1 - i)])
        contrib = lo + hi
        acc = contrib if acc is None else acc + contrib
        if lean:
            # Sequence iteration i+1 strictly after acc_i (the a/b
            # round-trip through the barrier is what orders the pads).
            acc, a, b = jax.lax.optimization_barrier((acc, a, b))
    limbs, _ = _propagate(acc)
    return limbs


def _mul_by_c(h, out_len):
    """h * c (3-limb constant) as unpropagated columns of width out_len."""
    kh = h.shape[-1]
    cols = jnp.zeros(h.shape[:-1] + (out_len,), jnp.uint32)
    for i in range(3):
        part = _C3[i] * h
        cols = cols.at[..., i:i + kh].add(part & _MASK)
        cols = cols.at[..., i + 1:i + 1 + kh].add(part >> LIMB_BITS)
    return cols


def _reduce_512(w):
    """512-bit canonical limbs -> canonical field element via two folds of
    2^256 ≡ c (mod p) plus a final conditional subtract."""
    lo, hi = w[..., :NUM_LIMBS], w[..., NUM_LIMBS:]
    cols = _mul_by_c(hi, NUM_LIMBS + 4)
    cols = cols.at[..., :NUM_LIMBS].add(lo)
    limbs, _ = _propagate(cols)                     # value < 2^299
    lo2, hi2 = limbs[..., :NUM_LIMBS], limbs[..., NUM_LIMBS:]
    cols2 = _mul_by_c(hi2, NUM_LIMBS)
    cols2 = cols2 + lo2
    limbs2, c2 = _propagate(cols2)                  # c2 in {0, 1}
    return _cond_sub_p(_add_c_times(limbs2, c2))


def mul(a, b):
    """(a * b) mod p, canonical in/out."""
    return _reduce_512(_mul_wide(a, b))


def sqr(a):
    return mul(a, a)


def cube(a):
    return mul(mul(a, a), a)


def pow_const(x, e: int):
    """x^e for a static Python-int exponent (square-and-multiply,
    MSB-first, fori_loop over a constant bit table)."""
    if e == 0:
        return jnp.broadcast_to(jnp.asarray(ONE), x.shape)
    bits = jnp.asarray([(e >> i) & 1 for i in range(e.bit_length())][::-1],
                       dtype=jnp.uint32)
    one = jnp.broadcast_to(jnp.asarray(ONE), x.shape)

    def body(i, acc):
        acc = mul(acc, acc)
        return jnp.where(bits[i] == 1, mul(acc, x), acc)

    return jax.lax.fori_loop(0, bits.shape[0], body, one)


def inv(x):
    """Fermat inverse x^(p-2); inv(0) = 0 (reference convention,
    SURVEY §3.1)."""
    return pow_const(x, MODULUS - 2)


def batch_inv(v, rows: int = None):
    """Elementwise inverse of [N, 16] via the `multi_inv` Montgomery trick
    (SURVEY §3.1): ONE Fermat inversion plus prefix/suffix products.
    Zeros map to zero.

    Blocked two-level layout for TPU: the array is viewed as [R, C] rows;
    in-row prefix/suffix products run as `lax.scan`s over C steps
    vectorized across R lanes (small loop bodies -> fast XLA compiles,
    unlike an unrolled log-depth associative scan), and the R row totals
    are combined with one more tiny scan.
    """
    n = v.shape[0]
    if rows is None:
        rows = 1
        while rows * rows < n and rows < 4096:
            rows *= 2
        while n % rows:
            rows //= 2
    cols = n // rows
    assert rows * cols == n, (n, rows)

    is_zero = jnp.all(v == 0, axis=-1, keepdims=True)
    one = jnp.broadcast_to(jnp.asarray(ONE), v.shape)
    v1 = jnp.where(is_zero, one, v)

    vr = jnp.moveaxis(v1.reshape(rows, cols, NUM_LIMBS), 1, 0)  # [C, R, 16]
    one_row = jnp.broadcast_to(jnp.asarray(ONE), (rows, NUM_LIMBS))

    def scan_excl(carry, x):
        return mul(carry, x), carry

    # In-row exclusive prefix / suffix products.
    row_total, pre_excl = jax.lax.scan(scan_excl, one_row, vr)
    _, suf_excl_r = jax.lax.scan(scan_excl, one_row, vr[::-1])
    suf_excl = suf_excl_r[::-1]

    # Across-row exclusive prefix / suffix of the R row totals.
    one1 = jnp.asarray(ONE)
    total, row_pre_excl = jax.lax.scan(scan_excl, one1, row_total)
    _, row_suf_excl_r = jax.lax.scan(scan_excl, one1, row_total[::-1])
    row_suf_excl = row_suf_excl_r[::-1]

    total_inv = inv(total)

    # out[r, c] = (prod before) * (prod after) * total_inv.
    before = mul(row_pre_excl[None], pre_excl)      # [C, R, 16]
    after = mul(row_suf_excl[None], suf_excl)
    out = mul(mul(before, after), total_inv[None, None])
    out = jnp.moveaxis(out, 0, 1).reshape(n, NUM_LIMBS)
    return jnp.where(is_zero, jnp.zeros_like(out), out)


def powers_series(g, n: int):
    """[n, 16] array of g^0 .. g^(n-1) by log-doubling (log2 n device muls
    over growing arrays). n must be a power of two (or any size; the array
    is built by doubling and truncated)."""
    arr = jnp.asarray(ONE)[None]
    g_pow = g[None] if g.ndim == 1 else g
    while arr.shape[0] < n:
        arr = jnp.concatenate([arr, mul(arr, g_pow)], axis=0)
        g_pow = mul(g_pow, g_pow)
    return arr[:n]


def eq_zero(x):
    """Boolean [..., 1]-less mask: True where x == 0."""
    return jnp.all(x == 0, axis=-1)
