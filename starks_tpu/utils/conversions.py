"""Host-side conversions between Python ints, limb arrays, and bytes.

Limb convention (the framework-wide representation): a 256-bit field
element is 16 little-endian 16-bit limbs held in uint32 lanes, shape
[..., 16]; value = sum(limbs[k] << (16*k)). Transcript serialization is
32-byte BIG-endian per SURVEY.md §A.4 — conversions here are the only
place byte order crosses the host/device boundary.
"""

import numpy as np

NUM_LIMBS = 16
LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(x: int) -> np.ndarray:
    """Single Python int -> [16] uint32 limb vector."""
    return np.frombuffer(x.to_bytes(32, 'little'), dtype='<u2').astype(np.uint32)


def limbs_to_int(limbs) -> int:
    limbs = np.asarray(limbs, dtype=np.uint32)
    return int.from_bytes(limbs.astype('<u2').tobytes(), 'little')


def ints_to_limbs(xs) -> np.ndarray:
    """List of ints -> [N, 16] uint32 (via fast bytes round-trip)."""
    buf = b''.join(x.to_bytes(32, 'little') for x in xs)
    return np.frombuffer(buf, dtype='<u2').astype(np.uint32).reshape(len(xs), NUM_LIMBS)


def limbs_to_ints(limbs) -> list:
    arr = np.asarray(limbs, dtype=np.uint32).reshape(-1, NUM_LIMBS)
    raw = arr.astype('<u2').tobytes()
    return [int.from_bytes(raw[i * 32:(i + 1) * 32], 'little')
            for i in range(arr.shape[0])]


def limbs_to_be_bytes(limbs) -> bytes:
    """[N, 16] limbs -> concatenated 32-byte big-endian serializations
    (the Merkle-leaf / transcript byte format, SURVEY §A.4)."""
    arr = np.asarray(limbs, dtype=np.uint32).reshape(-1, NUM_LIMBS)
    return arr[:, ::-1].astype('>u2').tobytes()


def be_bytes_to_limbs(data: bytes) -> np.ndarray:
    arr = np.frombuffer(data, dtype='>u2').astype(np.uint32).reshape(-1, NUM_LIMBS)
    return arr[:, ::-1].copy()


def digest_words_to_bytes(words) -> bytes:
    """blake2s digest/state words (uint32, little-endian semantics) -> bytes."""
    return np.asarray(words, dtype=np.uint32).astype('<u4').tobytes()


def bytes_to_digest_words(data: bytes) -> np.ndarray:
    return np.frombuffer(data, dtype='<u4').astype(np.uint32)
