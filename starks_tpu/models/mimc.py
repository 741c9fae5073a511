"""MiMC permutation: trace generation + constraint definition.

The canonical single-register AIR instance (SURVEY §3.1 `starks/mimc.py`):
steps-1 rounds of x <- x^3 + c[i mod len(c)] (mod p). Trace generation is
inherently sequential per proof (SURVEY §8 'hard part #4'); for single
proofs it runs on host bigints (fast, overlappable with device work), and
`trace_batch_device` provides the vectorized `lax.scan` path that
amortizes across a proof batch.
"""

import jax
import jax.numpy as jnp

from ..ops import limbs as fl

MODULUS = fl.MODULUS


def mimc_forward(inp: int, steps: int, round_constants) -> int:
    for i in range(steps - 1):
        inp = (inp ** 3 + round_constants[i % len(round_constants)]) % MODULUS
    return inp


# Cube-root exponent: gcd(3, p-1) = 1 for this field (p-1 ≡ 1 mod 3),
# so x -> x^3 is a permutation and its inverse is x -> x^D with
# D = 3^(-1) mod (p-1). This is the VDF direction the reference pitches
# (SURVEY §3.1 mimc row): one ~256-bit exponentiation per round instead
# of one cube — ~100x slower, which is the point.
_CUBE_ROOT_EXP = pow(3, -1, MODULUS - 1)


def mimc_backward(out: int, steps: int, round_constants) -> int:
    """Inverse MiMC permutation (the slow VDF direction):
    x_i = (x_{i+1} - c[i mod n_c])^(3^-1 mod p-1), run backwards.
    Satisfies mimc_forward(mimc_backward(y)) == y."""
    x = out % MODULUS
    for i in range(steps - 2, -1, -1):
        c = round_constants[i % len(round_constants)]
        x = pow((x - c) % MODULUS, _CUBE_ROOT_EXP, MODULUS)
    return x


def trace_host(inp: int, steps: int, round_constants) -> list:
    trace = [inp]
    for i in range(steps - 1):
        trace.append((trace[-1] ** 3
                      + round_constants[i % len(round_constants)]) % MODULUS)
    return trace


def trace_limbs(inp: int, steps: int, round_constants):
    """Trace as a host [steps, 16] uint32 limb array: native C++ runtime
    when available (utils/native.py, ~10x the Python bigint loop — the
    prover's sequential Amdahl term), else the bigint path."""
    from ..utils import native
    from ..utils.conversions import ints_to_limbs
    t = native.mimc_trace(inp, steps, round_constants)
    if t is not None:
        return t.astype('uint32')
    return ints_to_limbs(trace_host(inp, steps, round_constants))


@jax.jit
def _scan_rounds(state, consts_tiled):
    """state [B, 16]; consts_tiled [steps-1, 16] -> trace [steps, B, 16]."""
    def body(x, c):
        nxt = fl.add(fl.cube(x), c[None])
        return nxt, x
    last, ys = jax.lax.scan(body, state, consts_tiled)
    return jnp.concatenate([ys, last[None]], axis=0)


def trace_batch_device(inp_limbs, steps: int, const_limbs):
    """Batched device trace: inp_limbs [B, 16], const_limbs [n_c, 16] ->
    [steps, B, 16]. One lax.scan; VPU utilization comes from the batch."""
    n_c = const_limbs.shape[0]
    reps = (steps - 1 + n_c - 1) // n_c
    tiled = jnp.tile(const_limbs, (reps, 1))[:steps - 1]
    return _scan_rounds(inp_limbs, tiled)
