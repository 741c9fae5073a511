"""starks-tpu: a TPU-native STARK proving framework.

Re-designed from scratch for TPU hardware (JAX/XLA; limb-vector field
kernels, batched NTT/LDE, layer-parallel blake2s Merkle commitments,
device-resident FRI, sharded four-step NTT over device meshes) with the
full capabilities of the pure-Python reference `computablelabs/starks`
(see SURVEY.md): proofs are bit-exact with the reference transcript.

Public API (lazy imports — importing the package does not initialize
JAX backends):

  Proving / verifying
    mk_mimc_proof(inp, steps, round_constants, mesh=None, config=...)
    verify_mimc_proof(inp, steps, round_constants, output, proof)
    prove_low_degree / verify_low_degree_proof      (FRI)
    AIR, prove_air, verify_air                      (general multi-register AIRs)
    prove_batch, verify_batch                       (data-parallel batch proving)

  Configuration
    StarkConfig, REFERENCE

  Serialization (reference `compression.py` equivalent)
    serialize, deserialize, bin_length, raw_length

  Algebra (reference class-stack equivalent)
    starks_tpu.algebra: IntegersModP, FiniteField, polynomials_over,
    multivariates_over
"""

_LAZY = {
    "mk_mimc_proof": ("starks_tpu.prover", "mk_mimc_proof"),
    "mk_mimc_proof_with_trace": ("starks_tpu.prover",
                                 "mk_mimc_proof_with_trace"),
    "prove_low_degree": ("starks_tpu.prover", "prove_low_degree"),
    "verify_mimc_proof": ("starks_tpu.verifier", "verify_mimc_proof"),
    "verify_low_degree_proof": ("starks_tpu.verifier",
                                "verify_low_degree_proof"),
    "VerificationError": ("starks_tpu.verifier", "VerificationError"),
    "AIR": ("starks_tpu.air", "AIR"),
    "prove_air": ("starks_tpu.air", "prove_air"),
    "verify_air": ("starks_tpu.air", "verify_air"),
    "prove_batch": ("starks_tpu.parallel.batch", "prove_batch"),
    "verify_batch": ("starks_tpu.parallel.batch", "verify_batch"),
    "StarkConfig": ("starks_tpu.config", "StarkConfig"),
    "REFERENCE": ("starks_tpu.config", "REFERENCE"),
    # NOTE: no "serialize"/"deserialize" top-level names — they would
    # shadow the `starks_tpu.serialize` submodule. Use serialize_proof /
    # deserialize_proof here or the submodule directly.
    "serialize_proof": ("starks_tpu.serialize", "serialize"),
    "deserialize_proof": ("starks_tpu.serialize", "deserialize"),
    "bin_length": ("starks_tpu.serialize", "bin_length"),
    "raw_length": ("starks_tpu.serialize", "raw_length"),
    "MODULUS": ("starks_tpu.ops.limbs", "MODULUS"),
}

__all__ = sorted(_LAZY) + ["__version__"]
__version__ = "0.1.0"


def __getattr__(name):
    try:
        mod_name, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(f"module 'starks_tpu' has no attribute {name!r}")
    import importlib
    value = getattr(importlib.import_module(mod_name), attr)
    globals()[name] = value
    return value


def __dir__():
    return __all__
