"""Batch proving: data parallelism over independent proofs.

Config 5 of BASELINE.json (64x 2^16 proofs across N>=2 hosts): proofs are
embarrassingly parallel, so DP is process-level — under
`jax.distributed`, each host proves the contiguous slice of the batch
its process index owns and only proof BYTES cross DCN (host gather by
the caller). Within a host, the sequential-trace Amdahl limit (SURVEY §8
hard part #4) is amortized by generating ALL traces in one batched
device scan while proofs stream through the device stages one by one.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .. import prover
from ..models import mimc as mimc_model
from ..ops import limbs as fl
from ..utils.conversions import ints_to_limbs, limbs_to_ints


def local_slice(n_items: int, process_index: int = None,
                process_count: int = None):
    """Contiguous slice of a batch owned by this host."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = (n_items + pc - 1) // pc
    return slice(pi * per, min(n_items, (pi + 1) * per))


def prove_batch(inputs, steps: int, round_constants, mesh=None,
                use_device_traces: bool = True):
    """Prove a batch of MiMC claims; returns a list of proof objects for
    THIS host's slice of the batch (all of it in single-process runs)."""
    sl = local_slice(len(inputs))
    local_inputs = list(inputs)[sl]
    if not local_inputs:
        return []

    traces = None
    if use_device_traces:
        # One batched scan generates every trace at full VPU width.
        inp_limbs = jnp.asarray(ints_to_limbs([x % prover.MODULUS
                                               for x in local_inputs]))
        c_limbs = jnp.asarray(ints_to_limbs(
            [c % prover.MODULUS for c in round_constants]))
        dev_traces = mimc_model.trace_batch_device(inp_limbs, steps, c_limbs)
        # [steps, B, 16] -> per-proof host lists fed to the prover.
        traces = np.asarray(jnp.transpose(dev_traces, (1, 0, 2)))

    proofs = []
    for i, inp in enumerate(local_inputs):
        if traces is not None:
            proofs.append(prover.mk_mimc_proof_with_trace(
                inp, steps, round_constants, traces[i], mesh=mesh))
        else:
            proofs.append(prover.mk_mimc_proof(inp, steps, round_constants,
                                               mesh=mesh))
    return proofs


def verify_batch(inputs, steps: int, round_constants, outputs, proofs):
    """Verify this host's slice; returns list of bools."""
    from .. import verifier
    out = []
    for inp, output, proof in zip(inputs, outputs, proofs):
        try:
            out.append(verifier.verify_mimc_proof(inp, steps,
                                                  round_constants, output,
                                                  proof))
        except AssertionError:
            out.append(False)
    return out
