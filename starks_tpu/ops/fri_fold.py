"""FRI fold-by-4 as a closed-form batched kernel.

The reference folds by interpolating a quartic through each stride-N/4
coset {x, x*eta, x*eta^2, x*eta^3} (eta = 4th root of unity) and
evaluating it at the Fiat-Shamir point s (`starks/fri.py ::
prove_low_degree` via `multi_interp_4`, SURVEY §4.3). Because the coset
is a multiplicative coset of the order-4 subgroup, that quartic's
coefficients are a 4-point inverse DFT of the row values:

    a_k = (1/4) x^{-k} sum_j y_j eta^{-jk},   column = sum_k a_k s^k
        = (1/4) [A0 + A1 u + A2 u^2 + A3 u^3],  u = s/x,

with A = radix-2 butterflies of the rows (eta^2 = -1). No per-group
inversions: x^{-1} is an index-reversal of the domain power table. The
result is the IDENTICAL field element the reference computes (same
polynomial, same point), so transcripts stay bit-exact — verified
against the oracle in tests/test_prover.py.

Runs as a short sequence of small jitted kernels (see ops/kernels.py).
"""

import jax
import jax.numpy as jnp

from . import kernels as kn
from . import limbs as fl


@jax.jit
def _idft4(values, eta):
    """Rows -> 4-point inverse-DFT coefficients A0..A3 (one small graph:
    1 modmul + 6 add/sub)."""
    n = values.shape[0]
    rows = values.reshape(4, n // 4, fl.NUM_LIMBS)
    y0, y1, y2, y3 = rows[0], rows[1], rows[2], rows[3]
    e0 = fl.add(y0, y2)
    d02 = fl.sub(y0, y2)
    e1 = fl.add(y1, y3)
    d13 = fl.sub(y1, y3)
    a0 = fl.add(e0, e1)
    a2 = fl.sub(e0, e1)
    h = fl.mul(d13, eta[None])
    a1 = fl.sub(d02, h)
    a3 = fl.add(d02, h)
    return a0, a1, a2, a3


def fold4(values, powers, eta, special_x, inv4):
    """[n, 16] evaluations -> [n/4, 16] folded column at `special_x`."""
    n = values.shape[0]
    q = n // 4
    a0, a1, a2, a3 = _idft4(values, eta)
    inv_powers = jnp.concatenate([powers[:1], powers[:0:-1]], axis=0)
    u = kn.mul(jnp.broadcast_to(special_x[None], (q, fl.NUM_LIMBS)),
               inv_powers[:q])
    horner = kn.mul_add(u, a3, a2)
    horner = kn.mul_add(u, horner, a1)
    horner = kn.mul_add(u, horner, a0)
    return kn.mul(horner, jnp.broadcast_to(inv4[None], (q, fl.NUM_LIMBS)))
