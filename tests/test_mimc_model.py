"""MiMC model: forward permutation, VDF inverse direction, trace paths."""

from starks_tpu.models import mimc as mm

CONSTS = [(i ** 7) ^ 42 for i in range(16)]


class TestMimcVDF:
    def test_backward_inverts_forward(self):
        steps = 128
        for inp in (0, 1, 3, 12345, mm.MODULUS - 7):
            out = mm.mimc_forward(inp, steps, CONSTS)
            assert mm.mimc_backward(out, steps, CONSTS) == inp % mm.MODULUS

    def test_forward_inverts_backward(self):
        steps = 64
        y = 987654321
        x = mm.mimc_backward(y, steps, CONSTS)
        assert mm.mimc_forward(x, steps, CONSTS) == y


class TestTracePaths:
    def test_native_trace_matches_bigint(self):
        import os
        import numpy as np
        from starks_tpu.utils.conversions import ints_to_limbs
        steps = 256
        native = np.asarray(mm.trace_limbs(3, steps, CONSTS))
        bigint = ints_to_limbs(mm.trace_host(3, steps, CONSTS))
        assert np.array_equal(native, np.asarray(bigint))
