"""Proof serialization: round-trip identity + compression effectiveness.

The v2 codec (starks_tpu/serialize.py) prunes every Merkle node the
decoder can re-derive by hashing; at steps=2^13 this lands at ~218 kB vs
347 kB for dedup-only and 613 kB raw (see the module docstring's floor
analysis)."""

import pytest

from starks_tpu import serialize as ser


def _tiny_proof(steps=128, nconst=32, inp=3):
    import oracle.stark as ostark
    return ostark.mk_mimc_proof(inp, steps,
                                [(i ** 7) ^ 42 for i in range(nconst)])


def _deep_eq(a, b):
    if isinstance(a, bytes) or isinstance(b, bytes):
        return a == b
    return len(a) == len(b) and all(_deep_eq(x, y) for x, y in zip(a, b))


class TestSerialize:
    def test_roundtrip(self):
        proof = _tiny_proof()
        blob = ser.serialize(proof)
        assert _deep_eq(ser.deserialize(blob), proof)

    def test_roundtrip_larger(self):
        proof = _tiny_proof(steps=512, nconst=64)
        blob = ser.serialize(proof)
        assert _deep_eq(ser.deserialize(blob), proof)

    def test_compression_beats_dedup_only(self):
        proof = _tiny_proof(steps=512, nconst=64)
        v2 = ser.bin_length(proof)
        v1 = len(ser.serialize_v1(proof))
        raw = ser.raw_length(proof)
        assert v2 < 0.8 * v1, (v2, v1)
        assert v2 < 0.45 * raw, (v2, raw)

    def test_canonical_mimc_proof_uses_v3(self):
        # A regression that breaks the pruned codec for ordinary MiMC
        # proofs must not hide behind the silent v1 fallback (ADVICE
        # r3): the canonical 5-element MiMC shape must emit v3 magic.
        blob = ser.serialize(_tiny_proof())
        assert blob[:5] == ser._MAGIC_V3, blob[:5]

    def test_v1_still_readable(self):
        proof = _tiny_proof()
        blob = ser.serialize_v1(proof)
        assert _deep_eq(ser.deserialize(blob), proof)

    def test_tamper_detected(self):
        blob = ser.serialize(_tiny_proof())
        with pytest.raises((AssertionError, ValueError, IndexError)):
            ser.deserialize(blob[:-7])

    def test_nondefault_exclusion_roundtrips(self):
        # Round-2 advisor repro: a transcript whose FS exclusion period
        # differs from the codec default used to round-trip to a
        # DIFFERENT proof silently. The self-check in serialize() must
        # make every such case round-trip exactly (pruned if the replay
        # matches, v1 fallback otherwise).
        proof = _tiny_proof()
        for ex in (0, 4):
            blob = ser.serialize(proof, exclude_multiples_of=ex)
            assert _deep_eq(ser.deserialize(blob), proof), ex

    def test_non_mimc_shape_roundtrips(self):
        # AIR proofs carry 6 elements (regression: v2 raised 'too many
        # values to unpack' and propagated to ProofStore/bin_length).
        air_like = [b'\x01' * 32, b'\x02' * 32, [[b'\x03' * 96] * 3],
                    [[b'\x04' * 32] * 2], [[b'\x05' * 32, []]],
                    b'\x06' * 32]
        blob = ser.serialize(air_like)
        assert _deep_eq(ser.deserialize(blob), air_like)
        assert ser.bin_length(air_like) == len(blob)

    def test_verifies_after_roundtrip(self):
        import oracle.stark as ostark
        from oracle.mimc import mimc
        consts = [(i ** 7) ^ 42 for i in range(32)]
        proof = _tiny_proof()
        back = ser.deserialize(ser.serialize(proof))
        out = mimc(3, 128, consts)
        assert ostark.verify_mimc_proof(3, 128, consts, out, back)
