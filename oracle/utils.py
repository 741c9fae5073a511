"""Hash + Fiat-Shamir utilities.

Spec: SURVEY.md §3.1 "Hash + transcript utils" (`starks/utils.py [~1-60]`)
and §A.3/§A.5. blake2s-256 on raw bytes; pseudorandom indices derived by
iterated hashing with an arithmetic remap that skips indices divisible by
`exclude_multiples_of`.
"""

import hashlib


def blake(x: bytes) -> bytes:
    """32-byte blake2s digest of raw bytes (SURVEY §A.3)."""
    return hashlib.blake2s(x).digest()


def is_a_power_of_2(x: int) -> bool:
    return x > 0 and (x & (x - 1)) == 0


def get_power_cycle(r: int, modulus: int) -> list:
    """Full power cycle [1, r, r^2, ...] of the multiplicative subgroup <r>.

    Spec: SURVEY §3.1 utils row (`get_power_cycle`).
    """
    o = [1, r]
    while o[-1] != 1:
        o.append((o[-1] * r) % modulus)
    return o[:-1]


def get_pseudorandom_indices(seed: bytes, modulus: int, count: int,
                             exclude_multiples_of: int = 0) -> list:
    """Derive `count` indices in [0, modulus) from a 32-byte seed.

    Seed-extension loop appends blake(last 32 bytes); indices are 4-byte
    big-endian words reduced mod `modulus`. When `exclude_multiples_of`
    is set, reduce mod modulus*(ex-1)/ex and remap x -> x + 1 + x//(ex-1),
    which enumerates exactly the indices not divisible by ex.

    Spec: SURVEY §A.5 / §3.1 (`get_pseudorandom_indices`).
    """
    assert modulus < 2**24
    data = seed
    while len(data) < 4 * count:
        data += blake(data[-32:])
    if exclude_multiples_of == 0:
        return [int.from_bytes(data[i: i + 4], 'big') % modulus
                for i in range(0, count * 4, 4)]
    ex = exclude_multiples_of
    real_modulus = modulus * (ex - 1) // ex
    o = [int.from_bytes(data[i: i + 4], 'big') % real_modulus
         for i in range(0, count * 4, 4)]
    return [x + 1 + (x // (ex - 1)) for x in o]
