"""Algebra class stack: Z/pZ, GF(p^m), polynomials, multivariate AIR DSL.

Mirrors the reference's test_finite_field / test_polynomial coverage
(SURVEY.md §5): field axioms on random elements, inverse round-trips,
polynomial mul/divmod round-trips, irreducibility, and the multivariate
constraint compiler against both host and device ops namespaces.
"""

import random

import pytest

from starks_tpu.algebra import (IntegersModP, polynomials_over, FiniteField,
                                multivariates_over, compile_transition)
from starks_tpu.algebra.finite_field import (is_irreducible,
                                             generate_irreducible_polynomial)
from starks_tpu.ops import limbs as fl

P_STARK = fl.MODULUS


class TestIntegersModP:
    def test_axioms_random(self):
        rng = random.Random(0)
        F = IntegersModP(P_STARK)
        for _ in range(50):
            a, b, c = (F(rng.randrange(P_STARK)) for _ in range(3))
            assert (a + b) * c == a * c + b * c
            assert a - a == F(0)
            assert a * F(1) == a
            if a:
                assert a * a.inverse() == F(1)
                assert a / a == F(1)

    def test_factory_memoized_and_int_interop(self):
        F = IntegersModP(17)
        assert F is IntegersModP(17)
        assert F(20) == 3 == F(3)
        assert 2 + F(16) == F(1)
        assert 2 * F(9) == F(1)
        assert F(5) ** -1 == F(7)
        assert int(F(-1)) == 16

    def test_non_unit_raises(self):
        F = IntegersModP(15)
        with pytest.raises(ZeroDivisionError):
            F(5).inverse()


class TestPolynomial:
    def test_mul_divmod_roundtrip(self):
        rng = random.Random(1)
        F = IntegersModP(2 ** 31 - 1)
        Poly = polynomials_over(F)
        for _ in range(20):
            a = Poly([rng.randrange(F.modulus) for _ in range(8)])
            b = Poly([rng.randrange(F.modulus) for _ in range(5)])
            if b.is_zero():
                continue
            q, r = divmod(a, b)
            assert q * b + r == a
            assert r.degree() < b.degree()

    def test_eval_and_pow(self):
        F = IntegersModP(101)
        Poly = polynomials_over(F)
        p = Poly([1, 2, 3])                        # 1 + 2x + 3x^2
        assert p(F(10)) == F((1 + 20 + 300) % 101)
        assert (Poly.x() + 1) ** 2 == Poly([1, 2, 1])

    def test_gcd_monic(self):
        F = IntegersModP(13)
        Poly = polynomials_over(F)
        a = Poly([1, 1]) * Poly([2, 1])            # (x+1)(x+2)
        b = Poly([1, 1]) * Poly([3, 1])
        assert a.gcd(b) == Poly([1, 1])


class TestFiniteField:
    def test_irreducible_generation(self):
        for p, m in [(13, 2), (13, 3), (2, 8)]:
            f = generate_irreducible_polynomial(p, m)
            assert f.degree() == m
            assert is_irreducible(f, p)

    def test_reducible_detected(self):
        F = IntegersModP(13)
        Poly = polynomials_over(F)
        assert not is_irreducible(Poly([1, 1]) * Poly([2, 1]), 13)

    def test_field_axioms_gf_p2(self):
        Fq = FiniteField(13, 2)
        rng = random.Random(2)
        for _ in range(30):
            a = Fq([rng.randrange(13), rng.randrange(13)])
            b = Fq([rng.randrange(13), rng.randrange(13)])
            assert (a + b) - b == a
            if a:
                assert a * a.inverse() == Fq(1)
                assert (a ** 5) * (a ** -5) == Fq(1)
        # Multiplicative group order divides p^m - 1.
        a = Fq([1, 1])
        assert a ** (13 ** 2 - 1) == Fq(1)

    def test_explicit_modulus(self):
        # x^2 + 1 irreducible over F_3.
        Fq = FiniteField(3, 2, polynomial_coeffs=(1, 0, 1))
        i = Fq([0, 1])
        assert i * i == Fq(-1)


class TestMultivariate:
    def test_ring_ops_and_eval(self):
        F = IntegersModP(97)
        MV = multivariates_over(F, 3)
        x, y, z = MV.variables()
        p = (x + y) * (x - y) + z ** 2
        assert p == x ** 2 - y ** 2 + z * z
        assert p([3, 4, 5]) == F(9 - 16 + 25)
        assert p.total_degree() == 2

    def test_partial_eval(self):
        F = IntegersModP(97)
        MV = multivariates_over(F, 2)
        x, y = MV.variables()
        p = x ** 2 * y + 3 * y + 5
        q = p.partial_eval({0: 2})                  # 4y + 3y + 5
        assert q == 7 * y + 5

    def test_compile_transition_matches_host_and_device(self):
        """The MiMC constraint as a multivariate poly, evaluated through
        HostOps (ints) and DeviceOps (limb arrays), must agree."""
        import numpy as np
        from starks_tpu.air import HostOps, DeviceOps
        from starks_tpu.utils.conversions import ints_to_limbs, limbs_to_ints
        import jax.numpy as jnp

        F = IntegersModP(P_STARK)
        MV = multivariates_over(F, 3)               # cur, nxt, k
        cur, nxt, k = MV.variables()
        constraint = nxt - cur ** 3 - k
        transition = compile_transition([constraint], width=1,
                                        num_constants=1)

        rng = random.Random(3)
        n = 8
        cur_i = [rng.randrange(P_STARK) for _ in range(n)]
        nxt_i = [rng.randrange(P_STARK) for _ in range(n)]
        k_i = [rng.randrange(P_STARK) for _ in range(n)]

        host = [transition([c], [nx], [kk], HostOps())[0]
                for c, nx, kk in zip(cur_i, nxt_i, k_i)]
        dev = transition([jnp.asarray(ints_to_limbs(cur_i))],
                         [jnp.asarray(ints_to_limbs(nxt_i))],
                         [jnp.asarray(ints_to_limbs(k_i))],
                         DeviceOps(n))[0]
        assert limbs_to_ints(np.asarray(dev)) == host
