"""Radix-2 NTT over the multiplicative subgroup <root_of_unity> of F_p*.

Spec: SURVEY.md §3.1 "NTT/FFT" + §4.4 (`starks/fft.py [~1-110]`):
natural-order in/out, recursive decimation-in-time, O(n^2) base case for
n <= 4, zero-padding to subgroup size; inverse = forward with the reversed
root cycle then scale by n^-1 mod p. Kept recursive so the oracle's cost
model matches the reference prover it stands in for.
"""


def _simple_ft(vals, modulus, roots_of_unity):
    L = len(roots_of_unity)
    o = []
    for i in range(L):
        last = 0
        for j in range(L):
            last += vals[j] * roots_of_unity[(i * j) % L]
        o.append(last % modulus)
    return o


def _fft(vals, modulus, roots_of_unity):
    if len(vals) <= 4:
        return _simple_ft(vals, modulus, roots_of_unity)
    L = _fft(vals[::2], modulus, roots_of_unity[::2])
    R = _fft(vals[1::2], modulus, roots_of_unity[::2])
    o = [0] * len(vals)
    for i, (x, y) in enumerate(zip(L, R)):
        y_times_root = y * roots_of_unity[i]
        o[i] = (x + y_times_root) % modulus
        o[i + len(L)] = (x - y_times_root) % modulus
    return o


def fft(vals, modulus, root_of_unity, inv=False):
    """Forward/inverse NTT; zero-pads `vals` to the order of <root_of_unity>."""
    rootz = [1, root_of_unity]
    while rootz[-1] != 1:
        rootz.append(rootz[-1] * root_of_unity % modulus)
    if len(rootz) > len(vals) + 1:
        vals = vals + [0] * (len(rootz) - len(vals) - 1)
    if inv:
        # Inverse: reversed root cycle = powers of omega^-1, then scale by n^-1.
        invlen = pow(len(vals), modulus - 2, modulus)
        return [x * invlen % modulus
                for x in _fft(vals, modulus, rootz[:0:-1])]
    return _fft(vals, modulus, rootz[:-1])
