"""fl.mul variants on chip: tree-sum accumulation + carry-lookahead.

Current mul = 44 M modmul/s at 2^20 (K-chained, floor-subtracted) vs
~220 M implied by the measured ceiling. Candidates:
  A. current (sequential accumulate, 32-step ripple propagate)
  B. tree-sum accumulation (depth 16 -> 4), ripple propagate
  C. tree-sum + carry-lookahead propagate (associative_scan over
     (generate, propagate) pairs, depth ~4)
All validated elementwise against A before timing.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_axon"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from starks_tpu.ops import limbs as fl
from starks_tpu.utils import timing

NL = 16
MASK = jnp.uint32(0xFFFF)
C3 = jnp.asarray(fl._C3)


def mul_wide_tree(a, b):
    """Schoolbook partials summed as a binary TREE (depth 4)."""
    contribs = []
    for i in range(NL):
        part = a[..., i:i + 1] * b
        pad = [(0, 0)] * (part.ndim - 1)
        lo = jnp.pad(part & MASK, pad + [(i, NL - i)])
        hi = jnp.pad(part >> 16, pad + [(i + 1, NL - 1 - i)])
        contribs.append(lo + hi)
    while len(contribs) > 1:
        nxt = [contribs[j] + contribs[j + 1]
               for j in range(0, len(contribs) - 1, 2)]
        if len(contribs) % 2:
            nxt.append(contribs[-1])
        contribs = nxt
    return contribs[0]          # [.., 32] columns < 2^21


def propagate_la(cols):
    """Exact carry propagation via carry-lookahead (log-depth).

    cols: [..., k] uint32 columns < 2^21. Returns (limbs, carry_out)
    identical to fl._propagate.
    """
    lo = cols & MASK
    hi = cols >> 16                              # < 2^5
    k = cols.shape[-1]
    pad = [(0, 0)] * (cols.ndim - 1)
    b = jnp.pad(hi, pad + [(1, 0)])[..., :k]     # hi shifted up one limb
    s = lo + b                                   # <= 0xFFFF + 31
    g = (s >> 16).astype(jnp.uint32)             # in {0,1}
    p = (s & MASK) == MASK

    def op(x, y):
        gx, px = x
        gy, py = y
        return gy | (py & gx), jnp.logical_and(px, py)

    G, _ = jax.lax.associative_scan(op, (g.astype(bool), p), axis=-1)
    cin = jnp.pad(G, pad + [(1, 0)])[..., :k].astype(jnp.uint32)
    total = s + cin
    carry_out = ((G[..., -1].astype(jnp.uint32))
                 + jnp.pad(hi, pad + [(0, 0)])[..., -1] * 0)  # placeholder
    # carry out of the top limb: hi[k-1] (shifted out) + carry from G.
    carry_out = hi[..., -1] + (total[..., -1] >> 16)
    return total & MASK, carry_out


def reduce_512_with(w, prop):
    lo, hi = w[..., :NL], w[..., NL:]
    cols = fl._mul_by_c(hi, NL + 4)
    cols = cols.at[..., :NL].add(lo)
    limbs, _ = prop(cols)
    lo2, hi2 = limbs[..., :NL], limbs[..., NL:]
    cols2 = fl._mul_by_c(hi2, NL)
    cols2 = cols2 + lo2
    limbs2, c2 = prop(cols2)
    return fl._cond_sub_p(fl._add_c_times(limbs2, c2))


def mul_B(a, b):
    w, _ = fl._propagate(mul_wide_tree(a, b))
    return fl._reduce_512(w)


def mul_C(a, b):
    w, _ = propagate_la(mul_wide_tree(a, b))
    return reduce_512_with(w, propagate_la)


rng = np.random.default_rng(11)
N = 2 ** 20


def rand_fe(n):
    # full-range canonical elements
    import random
    r = random.Random(7)
    from starks_tpu.utils.conversions import ints_to_limbs
    return jnp.asarray(ints_to_limbs(
        [r.randrange(fl.MODULUS) for _ in range(n)]))


a_small = rand_fe(4096)
b_small = rand_fe(4096)
want = np.asarray(jax.jit(fl.mul)(a_small, b_small))
for name, f in (("B", mul_B), ("C", mul_C)):
    got = np.asarray(jax.jit(f)(a_small, b_small))
    ok = bool(np.array_equal(got, want))
    print(f"variant {name} correct: {ok}", flush=True)
    assert ok, name

a = jnp.asarray(rng.integers(0, 2 ** 16, (N, 16), dtype=np.uint32))
b = jnp.asarray(rng.integers(0, 2 ** 16, (N, 16), dtype=np.uint32))
K = 32
floor = timing.transfer_floor()
report = {"floor_s": floor}
for name, f in (("A", fl.mul), ("B", mul_B), ("C", mul_C)):
    def chain(x, y, f=f):
        for _ in range(K):
            x = f(x, y)
        return x
    t, _ = timing.timed(jax.jit(chain), a, b, reps=3)
    per = (t - floor) / K
    report[name] = {"per_mul_s": per, "modmul_per_s": N / per}
    print(f"{name}: {per*1e3:.2f} ms/mul -> {N/per/1e6:.1f} M modmul/s",
          flush=True)

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "exp_mul.json"), "w") as fh:
    json.dump(report, fh, indent=2)
