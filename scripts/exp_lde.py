"""Discriminate the composed-LDE slowdown trigger + Pallas smoke test.

E1 trace+barrier+lde with twiddle tables as ARGS
E2 same with tables as CLOSURE CONSTANTS
E3 the real fused core (args) re-measured
E4 args path extended with pointwise+tree stages
E5 Pallas blake2s on this backend: correctness + speed at 2^16

python scripts/exp_lde.py
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


def t(label, fn, *args, reps=3):
    f = jax.jit(fn)
    t0 = time.time()
    out = jax.block_until_ready(f(*args))
    print(f"  [{label}] compile+run {time.time()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(f(*args))
        best = min(best, time.time() - t0)
    print(f"{label:<44s} {best*1e3:9.2f} ms", flush=True)
    return out


def main():
    steps = 2 ** 13
    su = _FusedSetup.get(steps, REFERENCE)
    plan = su.plan
    constants = [(i ** 7) ^ 42 for i in range(64)]
    inp_l = jnp.asarray(int_to_limbs(3))
    reps_c = (steps - 1 + 63) // 64
    cs_np = np.asarray(ints_to_limbs([c % fl.MODULUS for c in constants]))
    cs_tiled = jnp.asarray(np.tile(cs_np, (reps_c, 1))[:steps - 1])
    barrier = jax.lax.optimization_barrier

    def e1(inp_l, cs_tiled, tis, nis, tfb):
        tr = barrier(fused.trace_scan(inp_l, cs_tiled))
        return fused.lde_fused(tr, tis, nis, tfb)
    t("E1 trace+barrier+lde (tables args)", e1, inp_l, cs_tiled,
      plan.tw_inv_small, plan.n_inv_small, plan.tw_fwd_big)

    def e2(inp_l, cs_tiled):
        tr = barrier(fused.trace_scan(inp_l, cs_tiled))
        return fused.lde_fused(tr, plan.tw_inv_small, plan.n_inv_small,
                               plan.tw_fwd_big)
    t("E2 trace+barrier+lde (tables consts)", e2, inp_l, cs_tiled)

    k_ext = su.k_ext_limbs(constants)
    core = su.core()
    args = (inp_l, cs_tiled, k_ext, su.zni8, su.h_pows, su.islope_l,
            su.last_l, su.one_l, plan.xs_big, plan.tw_inv_small,
            plan.n_inv_small, plan.tw_fwd_big, plan.fri_inv_pows,
            su.eta_l, su.inv4_l, su.inv_z2)
    jax.block_until_ready(core(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(core(*args))
        best = min(best, time.time() - t0)
    print(f"{'E3 real fused core':<44s} {best*1e3:9.2f} ms", flush=True)

    def e4(inp_l, cs_tiled, k_ext, zni8, islope_l, last_l, one_l, xs_big,
           tis, nis, tfb, inv_z2):
        tr = fused.trace_scan(inp_l, cs_tiled)
        output_l = tr[-1]
        tr = barrier(tr)
        p = barrier(fused.lde_fused(tr, tis, nis, tfb))
        precision, ext = su.precision, su.ext
        k_tiled = jnp.tile(k_ext, (precision // k_ext.shape[0], 1))
        zni_tiled = jnp.tile(zni8, (precision // ext, 1))
        p_shift = jnp.roll(p, -ext, axis=0)
        c_ev = fl.sub(fl.sub(p_shift, fl.cube(p)), k_tiled)
        xml = fl.sub(xs_big, last_l[None])
        d = fl.mul(fl.mul(c_ev, xml), zni_tiled)
        slope = fl.mul(fl.sub(output_l, inp_l), islope_l)
        i_ev = fl.add(fl.sub(inp_l, slope)[None],
                      fl.mul(slope[None], xs_big))
        b_ev = fl.mul(fl.sub(p, i_ev), inv_z2)
        d, b_ev = barrier((d, b_ev))
        mleaf = jnp.concatenate([b2.limbs_to_words(p),
                                 b2.limbs_to_words(d),
                                 b2.limbs_to_words(b_ev)], axis=-1)
        return barrier(fused.tree_build(mleaf))[2]
    t("E4 args path thru mtree", e4, inp_l, cs_tiled, k_ext, su.zni8,
      su.islope_l, su.last_l, su.one_l, plan.xs_big, plan.tw_inv_small,
      plan.n_inv_small, plan.tw_fwd_big, su.inv_z2)

    # E5: Pallas blake2s smoke + speed.
    try:
        from starks_tpu.ops.pblake import blake2s_words_pl
        rng = np.random.default_rng(11)
        msgs = rng.integers(0, 2 ** 32, (2 ** 16, 16), dtype=np.uint32)
        mj = jnp.asarray(msgs)
        got = np.asarray(blake2s_words_pl(mj, 64))
        import hashlib
        ok = all(got[i].astype('<u4').tobytes() ==
                 hashlib.blake2s(msgs[i].astype('<u4').tobytes()).digest()
                 for i in range(0, 2 ** 16, 4097))
        print(f"E5 pallas digests correct: {ok}", flush=True)
        f = jax.jit(lambda m: blake2s_words_pl(m, 64))
        jax.block_until_ready(f(mj))
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(f(mj))
            best = min(best, time.time() - t0)
        print(f"{'E5 pallas blake2s 2^16':<44s} {best*1e3:9.2f} ms",
              flush=True)
    except Exception as e:
        print("E5 pallas FAILED:", repr(e), flush=True)


if __name__ == "__main__":
    main()
