"""The MiMC permutation — the canonical AIR instance.

Spec: SURVEY.md §3.1 "MiMC computation" (`starks/mimc.py [~1-20]`):
steps-1 rounds of x <- x^3 + c[i mod len(c)] (mod p).
"""

MODULUS = 2**256 - 351 * 2**32 + 1


def mimc(inp, steps, round_constants, modulus=MODULUS):
    for i in range(steps - 1):
        inp = (inp ** 3 + round_constants[i % len(round_constants)]) % modulus
    return inp
