"""Pallas-safe 256-bit prime-field limb arithmetic.

Same math as `ops/limbs.py` (16 little-endian 16-bit limbs in uint32
lanes, sparse-prime fold reduction for p = 2^256 - 351*2^32 + 1; replaces
the reference's scalar bigint `PrimeField`, SURVEY.md §3.1) but written
under Pallas TPU lowering constraints:

- every constant is a Python scalar (kernels may not capture array
  constants), so p and c = 2^256 mod p are unrolled limb-by-limb;
- no scatter ops (`x.at[...].add` is not lowerable) — all limb shifting
  is jnp.pad / jnp.stack / jnp.concatenate.

These functions run identically under plain XLA tracing and inside
`pl.pallas_call` kernels; `ops/pkernels.py` wraps them into fused Pallas
kernels for the prover hot path.
"""

import jax
import jax.numpy as jnp

MODULUS = 2**256 - 351 * 2**32 + 1
NUM_LIMBS = 16
LIMB_BITS = 16
MASK = 0xFFFF

# p and c = 2^256 mod p = 351*2^32 - 1 as Python-int limb tuples.
P_LIMB_INTS = tuple((MODULUS >> (16 * i)) & 0xFFFF for i in range(16))
C_LIMB_INTS = (0xFFFF, 0xFFFF, 0x015E)


def _propagate(cols):
    """Carry-propagate columns (each < 2^31) into canonical 16-bit limbs.
    Returns (limbs, carry_out); statically unrolled over the limb axis."""
    k = cols.shape[-1]
    carry = jnp.zeros_like(cols[..., 0])
    outs = []
    for i in range(k):
        t = cols[..., i] + carry
        outs.append(t & MASK)
        carry = t >> LIMB_BITS
    return jnp.stack(outs, axis=-1), carry


def _sub_const_limbs(a, const_ints):
    """(a - const) mod 2^(16K) for a Python-int limb tuple; returns
    (limbs, no_borrow) via the add-complement trick, fully unrolled."""
    carry = None
    outs = []
    k = a.shape[-1]
    for i in range(k):
        ci = const_ints[i] if i < len(const_ints) else 0
        t = a[..., i] + (MASK - ci + (1 if i == 0 else 0))
        if carry is not None:
            t = t + carry
        outs.append(t & MASK)
        carry = t >> LIMB_BITS
    return jnp.stack(outs, axis=-1), carry


def _borrow_sub(a, b):
    """(a - b) mod 2^256 with no_borrow flag (1 iff a >= b)."""
    carry = None
    outs = []
    for i in range(a.shape[-1]):
        t = a[..., i] + (MASK + (1 if i == 0 else 0)) - b[..., i]
        if carry is not None:
            t = t + carry
        outs.append(t & MASK)
        carry = t >> LIMB_BITS
    return jnp.stack(outs, axis=-1), carry


def _add_c_times(limbs, carry):
    """limbs + carry*c, fully propagated (final carry provably zero).
    carry is a [...]-shaped uint32; c has 3 limbs so the contribution
    spans columns 0..3."""
    for _ in range(2):
        contrib = [jnp.zeros_like(carry) for _ in range(limbs.shape[-1])]
        for i, ci in enumerate(C_LIMB_INTS):
            contrib[i] = contrib[i] + (carry * ci & MASK)
            contrib[i + 1] = contrib[i + 1] + (carry * ci >> LIMB_BITS)
        cols = limbs + jnp.stack(contrib, axis=-1)
        limbs, carry = _propagate(cols)
    return limbs


def _cond_sub_p(limbs):
    d, ge = _sub_const_limbs(limbs, P_LIMB_INTS)
    return jnp.where((ge == 1)[..., None], d, limbs)


def add(a, b):
    limbs, carry = _propagate(a + b)
    return _cond_sub_p(_add_c_times(limbs, carry))


def sub(a, b):
    d, ge = _borrow_sub(a, b)
    # a < b: result is a - b + 2^256; subtract c to get a - b + p.
    d2, _ = _sub_const_limbs(d, C_LIMB_INTS)
    return jnp.where((ge == 1)[..., None], d, d2)


def neg(a):
    return sub(jnp.zeros_like(a), a)


def _mul_wide(a, b):
    """Schoolbook 16x16 -> 32-limb product as canonical limbs."""
    acc = None
    for i in range(NUM_LIMBS):
        part = a[..., i:i + 1] * b
        pad = [(0, 0)] * (part.ndim - 1)
        lo = jnp.pad(part & MASK, pad + [(i, NUM_LIMBS - i)])
        hi = jnp.pad(part >> LIMB_BITS, pad + [(i + 1, NUM_LIMBS - 1 - i)])
        contrib = lo + hi
        acc = contrib if acc is None else acc + contrib
    limbs, _ = _propagate(acc)
    return limbs


def _mul_by_c(h, out_len):
    """h * c (3-limb constant) as unpropagated columns of width out_len."""
    kh = h.shape[-1]
    pad = [(0, 0)] * (h.ndim - 1)
    acc = None
    for i, ci in enumerate(C_LIMB_INTS):
        part = ci * h
        lo = jnp.pad(part & MASK, pad + [(i, out_len - kh - i)])
        hi = jnp.pad(part >> LIMB_BITS, pad + [(i + 1, out_len - kh - i - 1)])
        contrib = lo + hi
        acc = contrib if acc is None else acc + contrib
    return acc


def _reduce_512(w):
    """512-bit canonical limbs -> canonical element via two c-folds."""
    lo, hi = w[..., :NUM_LIMBS], w[..., NUM_LIMBS:]
    cols = _mul_by_c(hi, NUM_LIMBS + 4)
    pad = [(0, 0)] * (lo.ndim - 1)
    cols = cols + jnp.pad(lo, pad + [(0, 4)])
    limbs, _ = _propagate(cols)                     # value < 2^299
    lo2, hi2 = limbs[..., :NUM_LIMBS], limbs[..., NUM_LIMBS:]
    cols2 = _mul_by_c(hi2, NUM_LIMBS) + lo2
    limbs2, c2 = _propagate(cols2)                  # c2 in {0, 1}
    return _cond_sub_p(_add_c_times(limbs2, c2))


def mul(a, b):
    return _reduce_512(_mul_wide(a, b))


def sqr(a):
    return mul(a, a)


def cube(a):
    return mul(mul(a, a), a)


def zeros_like(a):
    return jnp.zeros_like(a)


def one_like(a):
    """Broadcast 1 in limb form over a's shape (no array constants)."""
    z = jnp.zeros_like(a[..., :1])
    return jnp.concatenate([z + 1] + [z] * (NUM_LIMBS - 1), axis=-1)


def select(mask, a, b):
    """Elementwise select on [..., 16] limbs from a [...] bool mask."""
    return jnp.where(mask[..., None], a, b)


def eq_zero(x):
    return jnp.all(x == 0, axis=-1)
