"""Checkpoint / resume: content-addressed proof store + stage checkpoints.

SURVEY.md §6 (aux subsystems): the reference has NO checkpoint/resume —
its longest run is minutes and the proof is the only artifact. For
production batch proving this module supplies the TPU-native plan from
the survey: "Batch-prover driver retries failed shards; proofs are
stateless+deterministic so recovery = re-run of a shard; proof
artifacts content-addressed by transcript root" and "optional stage
checkpoints (post-LDE, post-commit arrays) for 2^20+ traces".

Layout under a store directory:

  claims/<claim_key>.proof      serialized proof (serialize.py wire format)
  claims/<claim_key>.json       claim metadata + transcript root (m_root)
  stages/<claim_key>.<stage>.npy  uint32 limb-array checkpoint

`claim_key` is blake2s over the canonical claim encoding (inp, steps,
round constants), so a crashed batch run resumes by skipping every claim
whose proof is already on disk — determinism makes re-proving and
resuming interchangeable.
"""

import json
import os

from ..transcript import blake
from .. import serialize as ser


def claim_key(inp: int, steps: int, round_constants) -> str:
    """Content address of a MiMC claim (hex blake2s digest).

    Inputs/constants are canonicalized mod the FIELD modulus (not 2^256):
    the prover reduces them mod p, so values differing by p are the same
    claim and must share a key, while values differing by 2^256 - p are
    distinct claims and must not collide."""
    from ..ops.limbs import MODULUS
    enc = (inp % MODULUS).to_bytes(32, 'big')
    enc += steps.to_bytes(8, 'big')
    enc += len(round_constants).to_bytes(8, 'big')
    for c in round_constants:
        enc += (c % MODULUS).to_bytes(32, 'big')
    return blake(enc).hex()


class ProofStore:
    """Durable, content-addressed proof + checkpoint store."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "claims"), exist_ok=True)
        os.makedirs(os.path.join(root, "stages"), exist_ok=True)

    # -- proofs -----------------------------------------------------------
    def _paths(self, key: str):
        base = os.path.join(self.root, "claims", key)
        return base + ".proof", base + ".json"

    def has_proof(self, key: str) -> bool:
        return os.path.exists(self._paths(key)[0])

    def put_proof(self, key: str, proof, meta: dict = None):
        """Persist a proof object; atomic rename so a crash mid-write
        never leaves a truncated artifact that `has_proof` would trust."""
        ppath, mpath = self._paths(key)
        data = ser.serialize(proof)
        m_root = proof[0].hex() if proof and isinstance(proof[0], bytes) \
            else None
        tmp = ppath + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, ppath)
        record = {"m_root": m_root, "bin_length": len(data)}
        record.update(meta or {})
        mtmp = mpath + ".tmp"
        with open(mtmp, "w") as f:
            json.dump(record, f)
        os.replace(mtmp, mpath)

    def get_proof(self, key: str):
        with open(self._paths(key)[0], "rb") as f:
            return ser.deserialize(f.read())

    def get_meta(self, key: str) -> dict:
        with open(self._paths(key)[1]) as f:
            return json.load(f)

    # -- stage checkpoints --------------------------------------------------
    def _stage_path(self, key: str, stage: str) -> str:
        return os.path.join(self.root, "stages", f"{key}.{stage}.npy")

    def put_stage(self, key: str, stage: str, array):
        """Checkpoint a device/host limb array (e.g. post-LDE p_evals)."""
        import numpy as np
        path = self._stage_path(key, stage)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.save(f, np.asarray(array))
        os.replace(tmp, path)

    def get_stage(self, key: str, stage: str):
        import numpy as np
        return np.load(self._stage_path(key, stage))

    def has_stage(self, key: str, stage: str) -> bool:
        return os.path.exists(self._stage_path(key, stage))
