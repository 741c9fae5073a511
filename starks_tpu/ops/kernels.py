"""Pre-jitted primitive kernels with persistent-cache-friendly granularity.

Empirically (this container's XLA builds, CPU and the tunneled TPU
backend alike), compile time grows super-linearly for deep fused uint32
elementwise graphs: a single limb-mul (~800 HLO) compiles in seconds,
but multi-mul fused stages (5k+ HLO) take minutes or never finish. So
the framework's execution model is: SMALL jitted kernels (one field op
of work each), host-orchestrated, with `jax.jit`'s per-shape cache plus
the persistent compilation cache amortizing compiles across runs.
Dispatch overhead is ~1 ms/call on the tunneled chip — negligible at
dozens of calls per proof. The Pallas layer replaces the hottest of
these with true fused kernels later without changing callers.
"""

import jax
import jax.numpy as jnp

from . import limbs as fl

mul = jax.jit(fl.mul)
add = jax.jit(fl.add)
sub = jax.jit(fl.sub)
cube = jax.jit(fl.cube)
batch_inv = jax.jit(fl.batch_inv)


@jax.jit
def mul_add(a, b, c):
    """a*b + c in one kernel (the add fuses into the mul's epilogue)."""
    return fl.add(fl.mul(a, b), c)


@jax.jit
def butterfly(xr, tw):
    """One NTT stage on [b, 2, m, 16]: (u, v) -> (u + tw*v, u - tw*v)."""
    u = xr[:, 0]
    v = fl.mul(xr[:, 1], tw[None])
    return jnp.stack([fl.add(u, v), fl.sub(u, v)], axis=1)


@jax.jit
def sub_sub(a, b, c):
    """a - b - c."""
    return fl.sub(fl.sub(a, b), c)


@jax.jit
def affine(a, b, xs):
    """a + b*xs (boundary interpolant evaluation)."""
    return fl.add(a[None], fl.mul(b[None], xs))
