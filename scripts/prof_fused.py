"""Per-stage device profiling of the fused prover core building blocks.

Times each stage of ops/fused.py separately (jitted, block_until_ready)
on the real chip so optimization targets the measured hot spots, not
guesses. Run: python scripts/prof_fused.py [steps_log2]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from starks_tpu.ops import fused, limbs as fl, blake2s as b2
from starks_tpu.prover import _FusedSetup
from starks_tpu.config import REFERENCE
from starks_tpu.utils.conversions import int_to_limbs, ints_to_limbs


def timeit(label, fn, *args, reps=3):
    fn_j = jax.jit(fn)
    out = jax.block_until_ready(fn_j(*args))   # compile
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn_j(*args))
        best = min(best, time.time() - t0)
    print(f"{label:<42s} {best * 1e3:9.2f} ms")
    return out


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    steps = 2 ** logn
    su = _FusedSetup.get(steps, REFERENCE)
    plan = su.plan
    precision = su.precision

    constants = [(i ** 7) ^ 42 for i in range(64)]
    inp_l = jnp.asarray(int_to_limbs(3))
    reps_c = (steps - 1 + 63) // 64
    cs_np = np.asarray(ints_to_limbs([c % fl.MODULUS for c in constants]))
    cs_tiled = jnp.asarray(np.tile(cs_np, (reps_c, 1))[:steps - 1])

    print(f"steps=2^{logn}  precision=2^{precision.bit_length()-1}")
    trace = timeit("trace_scan", fused.trace_scan, inp_l, cs_tiled)
    p = timeit("lde_fused (iNTT+NTT)", fused.lde_fused, trace,
               plan.tw_inv_small, plan.n_inv_small, plan.tw_fwd_big)

    xs_big = plan.xs_big
    timeit("pointwise: cube+sub chain", lambda p: fl.sub(
        fl.sub(jnp.roll(p, -8, axis=0), fl.cube(p)), p), p)
    timeit("one modmul [N]", fl.mul, p, xs_big)
    z2 = timeit("z2 build", lambda xs: fl.mul(
        fl.sub(xs, su.last_l[None]), fl.sub(xs, su.one_l[None])), xs_big)
    timeit("batch_inv_scan(z2)", fused.batch_inv_scan, z2)

    mleaf = jnp.concatenate([b2.limbs_to_words(p)] * 3, axis=-1)
    timeit("tree_build main (96B leaves)", fused.tree_build, mleaf)
    l_words = b2.limbs_to_words(p)
    tb = timeit("tree_build L (32B leaves)", fused.tree_build, l_words)
    l_lvl1, l_rest, l_root = tb

    timeit("blake2s 64B x N/2", lambda w: b2.blake2s_words(
        w.reshape(precision // 2, 16), 64), l_words)

    def fri(l, lw, l1, lr, root):
        return fused.fri_commit_scan(
            l, lw, l1, lr, root, plan.fri_inv_pows, su.schedule,
            su.eta_l, su.inv4_l, REFERENCE.fri_queries, 8)
    timeit("fri_commit_scan", fri, p, l_words, l_lvl1, l_rest, l_root)

    aug = jnp.arange(160, dtype=jnp.int32) * 37 % precision
    timeit("tree_bundle main", fused.tree_bundle, mleaf, *tb[:2], aug,
           precision.bit_length() - 1)


if __name__ == "__main__":
    main()
