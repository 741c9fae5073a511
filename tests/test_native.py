"""Native host runtime (native/starkrt.cpp via ctypes) vs Python bigints.

The reference has no native code (SURVEY.md §3.1: 100% Python), so the
oracle for every entry point is CPython bigint arithmetic itself.
"""

import random

import numpy as np
import pytest

from starks_tpu.ops.limbs import MODULUS
from starks_tpu.utils import native
from starks_tpu.utils import hostfield as hf
from starks_tpu.models.mimc import trace_host, trace_limbs

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")

RNG = random.Random(1234)
CONSTANTS = [(i ** 7) ^ 42 for i in range(64)]


def _to_int(row) -> int:
    return int.from_bytes(np.asarray(row, '<u2').tobytes(), 'little')


def test_mimc_trace_matches_bigint():
    t = native.mimc_trace(3, 512, CONSTANTS)
    ref = trace_host(3, 512, CONSTANTS)
    assert [_to_int(t[i]) for i in range(512)] == ref


def test_trace_limbs_wrapper():
    t = trace_limbs(7, 256, CONSTANTS)
    ref = trace_host(7, 256, CONSTANTS)
    assert t.dtype == np.uint32 and t.shape == (256, 16)
    got = [int.from_bytes(t[i].astype('<u2').tobytes(), 'little')
           for i in range(256)]
    assert got == ref


def test_power_table():
    g = pow(7, (MODULUS - 1) // 1024, MODULUS)
    pt = native.power_table(g, 1024)
    acc = 1
    for i in range(1024):
        assert _to_int(pt[i]) == acc
        acc = acc * g % MODULUS


def test_batch_inv():
    xs = [RNG.randrange(MODULUS) for _ in range(257)] + [0, 1, MODULUS - 1]
    inv = native.batch_inv_ints(xs)
    for x, ix in zip(xs, inv):
        assert x * ix % MODULUS == (1 if x else 0)


def test_ntt_matches_hostfield():
    n = 256
    w = pow(7, (MODULUS - 1) // n, MODULUS)
    vals = [RNG.randrange(MODULUS) for _ in range(n)]
    assert native.ntt_ints(vals, w) == hf.host_ntt(vals, w)
    assert native.ntt_ints(vals, w, inverse=True) == hf.host_ntt(
        vals, w, inverse=True)
    assert native.ntt_ints(native.ntt_ints(vals, w), w,
                           inverse=True) == vals


def test_mul_add_arrays():
    lib = native.get_lib()
    n = 100
    a_i = [RNG.randrange(MODULUS) for _ in range(n)]
    b_i = [RNG.randrange(MODULUS) for _ in range(n)]
    a = np.concatenate([native._int_to_le32(x) for x in a_i])
    b = np.concatenate([native._int_to_le32(x) for x in b_i])
    out = np.empty_like(a)
    lib.starkrt_mul_array(native._ptr(a), native._ptr(b), native._ptr(out), n)
    assert native._le32_to_ints(out) == [x * y % MODULUS
                                         for x, y in zip(a_i, b_i)]
    lib.starkrt_add_array(native._ptr(a), native._ptr(b), native._ptr(out), n)
    assert native._le32_to_ints(out) == [(x + y) % MODULUS
                                         for x, y in zip(a_i, b_i)]


def test_mul_edge_cases():
    lib = native.get_lib()
    edge = [0, 1, 2, MODULUS - 1, MODULUS - 2, 2**255, 2**256 % MODULUS,
            (MODULUS - 1) // 2]
    pairs = [(x, y) for x in edge for y in edge]
    a = np.concatenate([native._int_to_le32(x) for x, _ in pairs])
    b = np.concatenate([native._int_to_le32(y) for _, y in pairs])
    out = np.empty_like(a)
    lib.starkrt_mul_array(native._ptr(a), native._ptr(b), native._ptr(out),
                          len(pairs))
    assert native._le32_to_ints(out) == [x * y % MODULUS for x, y in pairs]
