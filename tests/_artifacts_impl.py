"""Checkpoint/resume subsystem (SURVEY §6): content-addressed proof
store, stage checkpoints, resumable + self-verifying batch proving."""

import numpy as np
import pytest

from starks_tpu.parallel import batch as pbatch
from starks_tpu.utils.artifacts import ProofStore, claim_key

STEPS = 64
CONSTS = [(i ** 7) ^ 42 for i in range(16)]


class TestProofStore:
    def test_claim_key_deterministic_and_distinct(self):
        k1 = claim_key(3, STEPS, CONSTS)
        assert k1 == claim_key(3, STEPS, CONSTS)
        assert k1 != claim_key(4, STEPS, CONSTS)
        assert k1 != claim_key(3, STEPS * 2, CONSTS)

    def test_proof_roundtrip(self, tmp_path):
        store = ProofStore(str(tmp_path))
        proof = [b'\x01' * 32, b'\x02' * 32, [[b'\x03' * 96]], [],
                 [[b'\x04' * 32]]]
        store.put_proof("k1", proof, {"inp": 3})
        assert store.has_proof("k1")
        assert store.get_proof("k1") == proof
        meta = store.get_meta("k1")
        assert meta["m_root"] == ('01' * 32)
        assert meta["inp"] == 3

    def test_stage_checkpoint_roundtrip(self, tmp_path):
        store = ProofStore(str(tmp_path))
        arr = np.arange(64, dtype=np.uint32).reshape(4, 16)
        store.put_stage("k1", "lde", arr)
        assert store.has_stage("k1", "lde")
        assert (store.get_stage("k1", "lde") == arr).all()
        assert not store.has_stage("k1", "merkle")


class TestResumableBatch:
    def test_resume_skips_proved_claims(self, tmp_path, monkeypatch):
        store = ProofStore(str(tmp_path))
        inps = [123, 456]
        first = pbatch.prove_batch(inps, STEPS, CONSTS, store=store)
        assert all(store.has_proof(claim_key(i, STEPS, CONSTS))
                   for i in inps)

        # A resumed run must load from the store, never re-prove.
        from starks_tpu import prover

        def boom(*a, **k):
            raise AssertionError("re-proved a stored claim")

        monkeypatch.setattr(prover, "mk_mimc_proof_with_trace", boom)
        monkeypatch.setattr(prover, "mk_mimc_proof", boom)
        resumed = pbatch.prove_batch(inps, STEPS, CONSTS, store=store)
        assert resumed == first

    def test_retry_recovers_transient_failure(self, monkeypatch):
        from starks_tpu import prover
        real = prover.mk_mimc_proof_with_trace
        calls = {"n": 0}

        def flaky(*a, **k):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("transient device fault")
            return real(*a, **k)

        monkeypatch.setattr(prover, "mk_mimc_proof_with_trace", flaky)
        proofs = pbatch.prove_batch([7], STEPS, CONSTS, max_retries=1,
                                    verify=True)
        assert calls["n"] == 2 and len(proofs) == 1

    def test_exhausted_retries_raise(self, monkeypatch):
        from starks_tpu import prover

        def dead(*a, **k):
            raise RuntimeError("device gone")

        monkeypatch.setattr(prover, "mk_mimc_proof_with_trace", dead)
        with pytest.raises(RuntimeError, match="failed after 2 attempts"):
            pbatch.prove_batch([7], STEPS, CONSTS, max_retries=1)
