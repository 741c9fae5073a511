"""Oracle self-consistency tests (SURVEY.md §5 test-strategy model).

These mirror the reference's unit + end-to-end coverage: field axioms,
FFT round-trips, Merkle branch round-trips + tamper detection, FRI
positive/negative, and the full MiMC prove -> verify loop at small steps.
"""

import random

import pytest

from oracle.field import PrimeField
from oracle.fft import fft, _simple_ft
from oracle.merkle import (merkelize, mk_branch, verify_branch,
                           mk_multi_branch, verify_multi_branch)
from oracle.fri import prove_low_degree, verify_low_degree_proof
from oracle.mimc import mimc
from oracle.stark import (mk_mimc_proof, verify_mimc_proof, MODULUS,
                          EXTENSION_FACTOR, GENERATOR)
from oracle.compression import (compress_branches, decompress_branches,
                                compress_fri, decompress_fri, bin_length)

f = PrimeField(MODULUS)
rng = random.Random(1234)


def rand_elt():
    return rng.randrange(MODULUS)


class TestField:
    def test_axioms(self):
        for _ in range(20):
            a, b, c = rand_elt(), rand_elt(), rand_elt()
            assert f.add(a, b) == f.add(b, a)
            assert f.mul(a, f.add(b, c)) == f.add(f.mul(a, b), f.mul(a, c))
            assert f.mul(a, f.inv(a)) == 1 or a == 0

    def test_inv_zero(self):
        assert f.inv(0) == 0

    def test_multi_inv_matches_inv(self):
        vals = [rand_elt() for _ in range(50)] + [0, 1, MODULUS - 1]
        assert f.multi_inv(vals) == [f.inv(v) for v in vals]

    def test_lagrange_roundtrip(self):
        xs = [rand_elt() for _ in range(6)]
        ys = [rand_elt() for _ in range(6)]
        poly = f.lagrange_interp(xs, ys)
        for x, y in zip(xs, ys):
            assert f.eval_poly_at(poly, x) == y

    def test_lagrange_2_and_4(self):
        xs4 = [rand_elt() for _ in range(4)]
        ys4 = [rand_elt() for _ in range(4)]
        assert f.lagrange_interp_4(xs4, ys4) == f.lagrange_interp(xs4, ys4)
        xs2, ys2 = xs4[:2], ys4[:2]
        assert f.lagrange_interp_2(xs2, ys2) == f.lagrange_interp(xs2, ys2)

    def test_multi_interp_4(self):
        xsets = [[rand_elt() for _ in range(4)] for _ in range(5)]
        ysets = [[rand_elt() for _ in range(4)] for _ in range(5)]
        batched = f.multi_interp_4(xsets, ysets)
        for xs, ys, poly in zip(xsets, ysets, batched):
            assert poly == f.lagrange_interp_4(xs, ys)
            assert f.eval_quartic(poly, xs[0]) == ys[0]

    def test_poly_div_roundtrip(self):
        a = [rand_elt() for _ in range(5)]
        b = [rand_elt() for _ in range(3)]
        prod = f.mul_polys(a, b)
        assert f.div_polys(prod, b) == a


class TestFFT:
    def _root(self, n):
        return pow(GENERATOR, (MODULUS - 1) // n, MODULUS)

    def test_matches_direct_dft(self):
        n = 8
        w = self._root(n)
        vals = [rand_elt() for _ in range(n)]
        roots = [pow(w, i, MODULUS) for i in range(n)]
        assert fft(vals, MODULUS, w) == _simple_ft(vals, MODULUS, roots)

    def test_inverse_roundtrip(self):
        n = 64
        w = self._root(n)
        vals = [rand_elt() for _ in range(n)]
        assert fft(fft(vals, MODULUS, w), MODULUS, w, inv=True) == vals

    def test_eval_consistency(self):
        # fft(coeffs) must equal pointwise polynomial evaluation.
        n = 16
        w = self._root(n)
        coeffs = [rand_elt() for _ in range(n)]
        evals = fft(coeffs, MODULUS, w)
        for i in range(n):
            assert evals[i] == f.eval_poly_at(coeffs, pow(w, i, MODULUS))

    def test_zero_padding(self):
        n = 32
        w = self._root(n)
        coeffs = [rand_elt() for _ in range(8)]
        assert fft(coeffs, MODULUS, w) == fft(coeffs + [0] * 24, MODULUS, w)


class TestMerkle:
    def test_branch_roundtrip(self):
        leaves = [rand_elt() for _ in range(32)]
        tree = merkelize(leaves)
        for i in range(32):
            branch = mk_branch(tree, i)
            assert verify_branch(tree[1], i, branch, output_as_int=True) == leaves[i]

    def test_multi_branch(self):
        leaves = [rand_elt() for _ in range(16)]
        tree = merkelize(leaves)
        idxs = [3, 7, 7, 0, 15]
        out = verify_multi_branch(tree[1], idxs, mk_multi_branch(tree, idxs))
        assert [int.from_bytes(x, 'big') for x in out] == [leaves[i] for i in idxs]

    def test_tamper_detected(self):
        leaves = [rand_elt() for _ in range(16)]
        tree = merkelize(leaves)
        branch = mk_branch(tree, 5)
        bad = bytes(32) if branch[1] != bytes(32) else bytes([1]) * 32
        branch[1] = bad
        with pytest.raises(AssertionError):
            verify_branch(tree[1], 5, branch)

    def test_bytes_leaves(self):
        leaves = [bytes([i]) * 96 for i in range(8)]
        tree = merkelize(leaves)
        assert verify_branch(tree[1], 2, mk_branch(tree, 2)) == leaves[2]


class TestFRI:
    def test_roundtrip_low_degree(self):
        n, deg = 4096, 1024
        w = pow(GENERATOR, (MODULUS - 1) // n, MODULUS)
        poly = [rand_elt() for _ in range(deg)]
        evals = fft(poly, MODULUS, w)
        proof = prove_low_degree(evals, w, deg, MODULUS)
        assert verify_low_degree_proof(merkelize(evals)[1], w, proof, deg, MODULUS)

    def test_high_degree_rejected(self):
        n, deg = 4096, 1024
        w = pow(GENERATOR, (MODULUS - 1) // n, MODULUS)
        evals = [rand_elt() for _ in range(n)]  # random => high degree
        proof = prove_low_degree(evals, w, deg, MODULUS)
        with pytest.raises(AssertionError):
            verify_low_degree_proof(merkelize(evals)[1], w, proof, deg, MODULUS)


class TestStark:
    def test_mimc_prove_verify(self):
        steps = 128
        constants = [(i ** 7) ^ 42 for i in range(64)]
        inp = 3
        output = mimc(inp, steps, constants)
        proof = mk_mimc_proof(inp, steps, constants)
        assert verify_mimc_proof(inp, steps, constants, output, proof)

    def test_wrong_output_rejected(self):
        steps = 128
        constants = [(i ** 7) ^ 42 for i in range(64)]
        proof = mk_mimc_proof(3, steps, constants)
        wrong = (mimc(3, steps, constants) + 1) % MODULUS
        with pytest.raises(AssertionError):
            verify_mimc_proof(3, steps, constants, wrong, proof)


class TestCompression:
    def test_branch_roundtrip(self):
        leaves = [rand_elt() for _ in range(64)]
        tree = merkelize(leaves)
        branches = mk_multi_branch(tree, [5, 9, 9, 33])
        comp = compress_branches(branches)
        assert decompress_branches(comp) == branches
        assert bin_length(comp) <= bin_length(branches)

    def test_fri_roundtrip(self):
        n, deg = 1024, 256
        w = pow(GENERATOR, (MODULUS - 1) // n, MODULUS)
        poly = [rand_elt() for _ in range(deg)]
        evals = fft(poly, MODULUS, w)
        proof = prove_low_degree(evals, w, deg, MODULUS)
        comp = compress_fri(proof)
        assert decompress_fri(comp) == proof
