"""Algebraic class stack: Z/pZ, GF(p^m), generic + multivariate polynomials.

Framework equivalent of the reference's object-oriented field/ring layer
(`starks/numbertype.py`, `starks/modp.py`/`finite_field.py`,
`starks/polynomial.py`, `starks/multivariate_polynomial.py`,
`starks/euclidean.py` — SURVEY.md §3.1 rows 2-4). Same capability surface
(operator-overloaded modular integers, extension fields over generated
irreducible polynomials, coefficient-vector polynomials over any field,
dict-of-exponents multivariate polynomials for AIR transition relations),
built fresh for this framework:

- These types live OFF the hot path: the prover's device kernels work on
  limb arrays (`starks_tpu.ops.limbs`). The algebra layer is for spec-level
  math (constraint definition, test oracles, extension-field scaffolding).
- The TPU-native twist is `multivariate.compile_transition`: a set of
  multivariate constraint polynomials lowers to a function over the AIR
  `ops` namespace, so ONE declarative constraint system executes both as
  vectorized limb kernels on device (prover) and as scalar bigint math on
  host (verifier). See `starks_tpu/air.py`.
"""

from .modp import IntegersModP
from .polynomial import polynomials_over
from .finite_field import FiniteField
from .multivariate import multivariates_over, compile_transition

__all__ = ["IntegersModP", "polynomials_over", "FiniteField",
           "multivariates_over", "compile_transition"]
