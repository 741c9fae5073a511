"""StarkConfig: frozen protocol parameterization (SURVEY §6 config row).

The default instance must reproduce the reference constants; a custom
instance (different blowup / query counts) must prove+verify end-to-end
and produce a transcript the default verifier rejects as malformed
parameters would imply.
"""

import dataclasses

import pytest

from starks_tpu.config import StarkConfig, REFERENCE
import starks_tpu.prover as tp
import starks_tpu.verifier as tv
from starks_tpu.models.mimc import mimc_forward

STEPS = 64
CONSTANTS = [(i ** 7) ^ 42 for i in range(16)]
INP = 7


def test_reference_values_pinned():
    assert REFERENCE.modulus == 2**256 - 351 * 2**32 + 1
    assert REFERENCE.generator == 7
    assert REFERENCE.extension_factor == 8
    assert REFERENCE.spot_checks == 80
    assert REFERENCE.fri_queries == 40
    assert REFERENCE.fri_fold_arity == 4
    assert REFERENCE.fri_base_cutoff == 16
    assert REFERENCE.precision(STEPS) == STEPS * 8


def test_frozen():
    with pytest.raises(dataclasses.FrozenInstanceError):
        REFERENCE.extension_factor = 4


def test_invalid_config_rejected():
    with pytest.raises(AssertionError):
        StarkConfig(extension_factor=6)
    with pytest.raises(AssertionError):
        StarkConfig(fri_fold_arity=2)


def test_custom_config_roundtrip():
    """4x blowup, 24 spot checks, 12 FRI queries: full prove/verify."""
    cfg = StarkConfig(extension_factor=4, spot_checks=24, fri_queries=12)
    proof = tp.mk_mimc_proof(INP, STEPS, CONSTANTS, config=cfg)
    output = mimc_forward(INP, STEPS, CONSTANTS)
    assert tv.verify_mimc_proof(INP, STEPS, CONSTANTS, output, proof,
                                config=cfg)
    # Branch counts follow the config, not the reference constants.
    assert len(proof[2]) == 2 * cfg.spot_checks
    assert len(proof[3]) == cfg.spot_checks
    # The default-config verifier must NOT accept it.
    with pytest.raises(AssertionError):
        tv.verify_mimc_proof(INP, STEPS, CONSTANTS, output, proof)
