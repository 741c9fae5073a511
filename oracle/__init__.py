"""Spec oracle: a minimal, pure-Python STARK prover/verifier.

This package is the Phase-0 artifact from SURVEY.md §8: an independent,
spec-faithful re-derivation of the reference pipeline
(`computablelabs/starks`, mounted empty at survey time — see SURVEY.md §0).
It exists to (a) freeze golden test vectors for the TPU framework at every
layer seam and (b) serve as the measured single-threaded CPU baseline
(BASELINE.md).

It is deliberately written in the reference's cost model — Python bigints,
recursive FFT, sequential Merkle builds — so its timings are an honest
stand-in for the reference prover. It is NOT part of the TPU framework
(`starks_tpu`); nothing here runs on device.

Spec source: SURVEY.md §A (bit-exactness spec), §4 (call stacks).
"""

from .field import PrimeField
from .fft import fft
from .merkle import merkelize, mk_branch, verify_branch, mk_multi_branch, verify_multi_branch
from .fri import prove_low_degree, verify_low_degree_proof
from .mimc import mimc
from .stark import mk_mimc_proof, verify_mimc_proof, MODULUS, EXTENSION_FACTOR
from .utils import blake, get_power_cycle, get_pseudorandom_indices, is_a_power_of_2
