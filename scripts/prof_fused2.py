"""Cumulative-prefix profiling of the fused core: time the real core
graph truncated after each stage; successive diffs give per-stage cost
as composed (XLA fusion context included).  python scripts/prof_fused2.py [logn]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from starks_tpu.ops import fused, limbs as fl, blake2s as b2
from starks_tpu.ops import transcript_dev as td
from starks_tpu.prover import _FusedSetup
from starks_tpu.config import REFERENCE
from starks_tpu.utils.conversions import int_to_limbs, ints_to_limbs


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    steps = 2 ** logn
    cfg = REFERENCE
    su = _FusedSetup.get(steps, cfg)
    plan = su.plan
    precision, ext = su.precision, su.ext
    schedule = su.schedule
    n_final = su.n_final
    logN = su.logn

    constants = [(i ** 7) ^ 42 for i in range(64)]
    inp_l = jnp.asarray(int_to_limbs(3))
    reps_c = (steps - 1 + 63) // 64
    cs_np = np.asarray(ints_to_limbs([c % fl.MODULUS for c in constants]))
    cs_tiled = jnp.asarray(np.tile(cs_np, (reps_c, 1))[:steps - 1])
    k_ext = su.k_ext_limbs(constants)

    def stage_upto(upto):
        def fn(inp_l, cs_tiled, k_ext):
            trace = fused.trace_scan(inp_l, cs_tiled)
            output_l = trace[-1]
            if upto == "trace":
                return trace
            p = fused.lde_fused(trace, plan.tw_inv_small, plan.n_inv_small,
                                plan.tw_fwd_big)
            if upto == "lde":
                return p
            k_tiled = jnp.tile(k_ext, (precision // k_ext.shape[0], 1))
            zni_tiled = jnp.tile(su.zni8, (precision // ext, 1))
            p_shift = jnp.roll(p, -ext, axis=0)
            c_ev = fl.sub(fl.sub(p_shift, fl.cube(p)), k_tiled)
            xs_minus_last = fl.sub(plan.xs_big, su.last_l[None])
            d = fl.mul(fl.mul(c_ev, xs_minus_last), zni_tiled)
            slope = fl.mul(fl.sub(output_l, inp_l), su.islope_l)
            i_ev = fl.add(fl.sub(inp_l, slope)[None],
                          fl.mul(slope[None], plan.xs_big))
            z2 = fl.mul(fl.sub(plan.xs_big, su.one_l[None]), xs_minus_last)
            if upto == "pointwise_noinv":
                return d, i_ev, z2
            b_ev = fl.mul(fl.sub(p, i_ev), fused.batch_inv_scan(z2))
            if upto == "pointwise":
                return d, b_ev
            mleaf = jnp.concatenate([b2.limbs_to_words(p),
                                     b2.limbs_to_words(d),
                                     b2.limbs_to_words(b_ev)], axis=-1)
            m_lvl1, m_rest, m_root = fused.tree_build(mleaf)
            if upto == "mtree":
                return m_root
            k1 = td.challenge_limbs(m_root, 1)
            k2 = td.challenge_limbs(m_root, 2)
            k3 = td.challenge_limbs(m_root, 3)
            k4 = td.challenge_limbs(m_root, 4)
            coef_p = jnp.tile(td.lincomb_coeffs(k1, k2, su.h_pows),
                              (precision // ext, 1))
            coef_b = jnp.tile(td.lincomb_coeffs(k3, k4, su.h_pows),
                              (precision // ext, 1))
            l = fl.add(d, fl.add(fl.mul(p, coef_p), fl.mul(b_ev, coef_b)))
            l_words = b2.limbs_to_words(l)
            l_lvl1, l_rest, l_root = fused.tree_build(l_words)
            if upto == "ltree":
                return l_root
            positions = td.pseudorandom_indices_dev(
                l_root, precision, cfg.spot_checks, exclude_multiples_of=ext)
            aug = jnp.stack([positions, (positions + ext) % precision],
                            axis=1).reshape(-1)
            main_bundle = fused.tree_bundle(mleaf, m_lvl1, m_rest, aug, logN)
            lc_bundle = fused.tree_bundle(l_words, l_lvl1, l_rest,
                                          positions, logN)
            if upto == "bundles":
                return main_bundle, lc_bundle
            col_roots, col_bundles, row_bundles, final_vals = \
                fused.fri_commit_scan(l, l_words, l_lvl1, l_rest, l_root,
                                      plan.fri_inv_pows, schedule,
                                      su.eta_l, su.inv4_l,
                                      cfg.fri_queries, ext)
            base_words = b2.limbs_to_words(final_vals[:n_final])
            parts = [m_root, l_root, main_bundle, lc_bundle, col_roots,
                     col_bundles, row_bundles, base_words]
            return jnp.concatenate([x.reshape(-1) for x in parts])
        return jax.jit(fn)

    stages = ["trace", "lde", "pointwise_noinv", "pointwise", "mtree",
              "ltree", "bundles", "full"]
    prev = 0.0
    for st in stages:
        fn = stage_upto(st)
        jax.block_until_ready(fn(inp_l, cs_tiled, k_ext))
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(fn(inp_l, cs_tiled, k_ext))
            best = min(best, time.time() - t0)
        print(f"upto {st:<18s} {best*1e3:9.1f} ms   (+{(best-prev)*1e3:8.1f} ms)")
        prev = best


if __name__ == "__main__":
    main()
