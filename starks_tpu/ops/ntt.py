"""Iterative radix-2 NTT over limb arrays.

TPU-native replacement for the reference's recursive Python FFT
(`starks/fft.py`, SURVEY.md §4.4). Same math — out[i] = sum_j v[j] w^(ij)
over the order-n subgroup <w>, inverse = DFT with w^-1 scaled by n^-1 —
but as an iterative decimation-in-time schedule: one bit-reversal gather
followed by log2(n) vectorized butterfly passes, each a single batched
limb modmul + add/sub on [n/2] elements. Natural order in/out, zero-pad
composition for the 8x LDE exactly as the reference composes iNTT(G1) /
NTT(G2) (SURVEY §4.1 steps 2-4).

Twiddles for every stage are strided slices of ONE cached power table
per domain; inverse twiddles are the index-reversal of the same table.
"""

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs as fl
from ..utils.conversions import int_to_limbs


def bit_reversal_permutation(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int32)
    rev = np.zeros_like(idx)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


class Domain:
    """Multiplicative subgroup <g> of F_p* of power-of-two order n, with
    lazily built device twiddle table and cached jitted NTT executables."""

    def __init__(self, n: int, g: int):
        assert n & (n - 1) == 0
        self.n = n
        self.g = g
        self.g_inv = pow(g, fl.MODULUS - 2, fl.MODULUS)
        self.n_inv_limbs = jnp.asarray(int_to_limbs(pow(n, fl.MODULUS - 2,
                                                        fl.MODULUS)))
        self.brev = jnp.asarray(bit_reversal_permutation(n))
        self._powers = None
        self._stage_tw = {}

    @property
    def powers(self):
        """[n, 16] device table of g^0 .. g^(n-1).

        Computed host-side with Python bigints (a few seconds even at
        2^23, one-time per domain) rather than eagerly on device: each
        eager op on the tunneled backend pays a remote-compile round
        trip, which dwarfs the arithmetic for a table build.
        """
        if self._powers is None:
            from ..utils import native
            table = native.power_table(self.g, self.n)
            if table is not None:
                self._powers = jnp.asarray(table.astype(np.uint32))
            else:
                from ..utils.conversions import ints_to_limbs
                vals = [1] * self.n
                acc = 1
                for i in range(1, self.n):
                    acc = acc * self.g % fl.MODULUS
                    vals[i] = acc
                self._powers = jnp.asarray(ints_to_limbs(vals))
        return self._powers

    @property
    def inv_powers_view(self):
        """g^-i table as an index-reversal of the forward table."""
        p = self.powers
        return jnp.concatenate([p[:1], p[:0:-1]], axis=0)

    def stage_twiddles(self, inverse: bool):
        """Per-stage twiddle arrays [m, 16] for m = 1, 2, ..., n/2 — all
        strided slices of the single power table, cached on device."""
        if inverse not in self._stage_tw:
            table = self.inv_powers_view if inverse else self.powers
            stages = []
            m = 1
            while m < self.n:
                stride = self.n // (2 * m)
                stages.append(jnp.asarray(table[::stride][:m]))
                m *= 2
            self._stage_tw[inverse] = stages
        return self._stage_tw[inverse]


_DOMAINS = {}


def get_domain(n: int, g: int) -> Domain:
    key = (n, g)
    if key not in _DOMAINS:
        _DOMAINS[key] = Domain(n, g)
    return _DOMAINS[key]


@jax.jit
def _gather_rows(x, idx):
    return jnp.take(x, idx, axis=0)


@jax.jit
def _butterfly_stage(x, tw):
    """One DIT stage on flat [n, 16]; pair distance = tw.shape[0]."""
    n = x.shape[0]
    m = tw.shape[0]
    xr = x.reshape(n // (2 * m), 2, m, fl.NUM_LIMBS)
    u = xr[:, 0]
    v = fl.mul(xr[:, 1], tw[None])
    out = jnp.stack([fl.add(u, v), fl.sub(u, v)], axis=1)
    return out.reshape(n, fl.NUM_LIMBS)


@jax.jit
def _scale(x, c):
    return fl.mul(x, c[None])


def ntt(values, domain: Domain, inverse: bool = False):
    """Forward/inverse NTT of [n, 16] limb values over `domain` (n must
    equal the domain order; callers zero-pad first, as the reference's
    `fft` does internally).

    Host loop dispatching ONE jitted kernel per stage: per-stage graphs
    stay small (one batched modmul each), which this container's XLA
    builds compile in seconds instead of blowing up on a fused
    whole-transform graph; the per-shape jit cache + persistent
    compilation cache make the stages one-time costs.
    """
    assert values.shape[0] == domain.n, (values.shape, domain.n)
    x = _gather_rows(values, domain.brev)
    for tw in domain.stage_twiddles(inverse):
        x = _butterfly_stage(x, tw)
    if inverse:
        x = _scale(x, domain.n_inv_limbs)
    return x


def zero_pad(values, n: int):
    pad = n - values.shape[0]
    assert pad >= 0
    if pad == 0:
        return values
    return jnp.concatenate(
        [values, jnp.zeros((pad, fl.NUM_LIMBS), jnp.uint32)], axis=0)


def lde(trace, trace_domain: Domain, eval_domain: Domain):
    """Low-degree extension: interpolate over the trace domain, evaluate
    over the (blowup x larger) evaluation domain. Matches the reference's
    fft(fft(trace, G1, inv=True), G2) composition bit-for-bit."""
    coeffs = ntt(trace, trace_domain, inverse=True)
    return ntt(zero_pad(coeffs, eval_domain.n), eval_domain), coeffs
