"""Arg-passing cumulative bisect of the fused core (all big tables as
jit ARGS, barrier-before-slice). Finds which stage reintroduces the
pathological schedule in the REAL core. python scripts/exp_lde2.py [upto...]
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
    steps = 2 ** 13
    cfg = REFERENCE
    su = _FusedSetup.get(steps, cfg)
    plan = su.plan
    precision, ext, logN = su.precision, su.ext, su.logn
    schedule, n_final = su.schedule, su.n_final

    constants = [(i ** 7) ^ 42 for i in range(64)]
    inp_l = jnp.asarray(int_to_limbs(3))
    reps_c = (steps - 1 + 63) // 64
    cs_np = np.asarray(ints_to_limbs([c % fl.MODULUS for c in constants]))
    cs_tiled = jnp.asarray(np.tile(cs_np, (reps_c, 1))[:steps - 1])
    k_ext = su.k_ext_limbs(constants)

    args = (inp_l, cs_tiled, k_ext, su.zni8, su.h_pows, su.islope_l,
            su.last_l, su.one_l, plan.xs_big, plan.tw_inv_small,
            plan.n_inv_small, plan.tw_fwd_big, plan.fri_inv_pows,
            su.eta_l, su.inv4_l, su.inv_z2)

    def build(upto):
        def fn(inp_l, cs_tiled, k_ext, zni8, h_pows, islope_l, last_l,
               one_l, xs_big, tw_inv_small, n_inv_small, tw_fwd_big,
               fri_inv_pows, eta_l, inv4_l, inv_z2):
            barrier = jax.lax.optimization_barrier
            trace = barrier(fused.trace_scan(inp_l, cs_tiled))
            output_l = trace[-1]
            p = fused.lde_fused(trace, tw_inv_small, n_inv_small,
                                tw_fwd_big)
            p = barrier(p)
            if upto == "lde":
                return p
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
            if upto == "pointwise":
                return d, b_ev
            mleaf = jnp.concatenate([b2.limbs_to_words(p),
                                     b2.limbs_to_words(d),
                                     b2.limbs_to_words(b_ev)], axis=-1)
            m_lvl1, m_rest, m_root = barrier(fused.tree_build(mleaf))
            if upto == "mtree":
                return m_root
            k1 = td.challenge_limbs(m_root, 1)
            k2 = td.challenge_limbs(m_root, 2)
            k3 = td.challenge_limbs(m_root, 3)
            k4 = td.challenge_limbs(m_root, 4)
            coef_p = jnp.tile(td.lincomb_coeffs(k1, k2, h_pows),
                              (precision // ext, 1))
            coef_b = jnp.tile(td.lincomb_coeffs(k3, k4, h_pows),
                              (precision // ext, 1))
            l = barrier(fl.add(d, fl.add(fl.mul(p, coef_p),
                                         fl.mul(b_ev, coef_b))))
            l_words = b2.limbs_to_words(l)
            l_lvl1, l_rest, l_root = barrier(fused.tree_build(l_words))
            if upto == "ltree":
                return l_root
            positions = td.pseudorandom_indices_dev(
                l_root, precision, cfg.spot_checks, exclude_multiples_of=ext)
            aug = jnp.stack([positions, (positions + ext) % precision],
                            axis=1).reshape(-1)
            main_bundle = fused.tree_bundle(mleaf, m_lvl1, m_rest, aug,
                                            logN)
            lc_bundle = fused.tree_bundle(l_words, l_lvl1, l_rest,
                                          positions, logN)
            main_bundle, lc_bundle = barrier((main_bundle, lc_bundle))
            if upto == "bundles":
                return main_bundle, lc_bundle
            col_roots, col_bundles, row_bundles, final_vals = \
                fused.fri_commit_scan(l, l_words, l_lvl1, l_rest, l_root,
                                      plan.fri_inv_pows if False else
                                      fri_inv_pows, schedule,
                                      eta_l, inv4_l, cfg.fri_queries, ext)
            base_words = b2.limbs_to_words(final_vals[:n_final])
            parts = [m_root, l_root, main_bundle, lc_bundle, col_roots,
                     col_bundles, row_bundles, base_words]
            return jnp.concatenate([x.reshape(-1) for x in parts])
        return jax.jit(fn)

    stages = sys.argv[1:] or ["lde", "pointwise", "mtree", "ltree",
                              "bundles", "full"]
    prev = 0.0
    for st in stages:
        fn = build(st)
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        c = time.time() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(fn(*args))
            best = min(best, time.time() - t0)
        print(f"upto {st:<12s} {best*1e3:9.1f} ms  (+{(best-prev)*1e3:8.1f})"
              f"  [compile {c:.0f}s]", flush=True)
        prev = best


if __name__ == "__main__":
    main()
