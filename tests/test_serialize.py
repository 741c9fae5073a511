"""Proof serialization: round-trip identity + compression effectiveness
(the ~65 kB-at-2^13 figure comes from branch-node dedup, SURVEY §3.1)."""

import pytest

from starks_tpu import serialize as ser


def _tiny_proof():
    import oracle.stark as ostark
    return ostark.mk_mimc_proof(3, 128, [(i ** 7) ^ 42 for i in range(32)])


class TestSerialize:
    def test_roundtrip(self):
        proof = _tiny_proof()
        blob = ser.serialize(proof)
        assert ser.deserialize(blob) == proof

    def test_compression_dedupes(self):
        proof = _tiny_proof()
        assert ser.bin_length(proof) < 0.7 * ser.raw_length(proof)

    def test_tamper_detected(self):
        blob = ser.serialize(_tiny_proof())
        with pytest.raises((AssertionError, ValueError, IndexError)):
            ser.deserialize(blob[:-7])

    def test_nested_structures(self):
        obj = [b'ab', [b'x' * 32, [b'x' * 32, b'']], [], [b'x' * 32]]
        blob = ser.serialize(obj)
        assert ser.deserialize(blob) == obj
        # The repeated 32-byte node must be stored once.
        assert blob.count(b'x' * 32) == 1
