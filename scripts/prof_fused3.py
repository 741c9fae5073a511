"""Cumulative-prefix profile of the host-trace fused core (round 3).

Times jitted PREFIXES of the traced core pipeline with fetch-forced
completion; successive differences attribute device time per stage.
Run: python scripts/prof_fused3.py [log2_steps]
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

from starks_tpu import prover as tp
from starks_tpu.ops import fused, limbs as fl, blake2s as b2
from starks_tpu.ops import transcript_dev as td
from starks_tpu.models import mimc as mimc_model
from starks_tpu.utils import timing

LOG2 = int(sys.argv[1]) if len(sys.argv) > 1 else 13
STEPS = 2 ** LOG2
CONSTANTS = [(i ** 7) ^ 42 for i in range(64)]
INP = 3

su = tp._FusedSetup.get(STEPS, tp.REFERENCE)
plan = su.plan
k_ext = su.k_ext_limbs(CONSTANTS)
cs_expand = su.expand_consts(CONSTANTS)
trace_np = np.asarray(mimc_model.trace_limbs(INP, STEPS, CONSTANTS))
ckpts = jnp.asarray(tp._trace_ckpts_packed(trace_np, su))

barrier = jax.lax.optimization_barrier
precision, ext, logn = su.precision, su.ext, su.logn
cfg = su.config


def stage_chain(upto):
    def fn(ckpt_packed, cs_exp, k_ext, zni8, h_pows, islope_l, last_l,
           one_l, xs_big, tw_inv_small, n_inv_small, tw_fwd_big,
           fri_inv_pows, eta_l, inv4_l, inv_z2):
        tr = barrier(fused.expand_trace(fused.unpack_limbs(ckpt_packed),
                                        cs_exp))
        if upto == "expand":
            return tr
        inp_l, output_l = tr[0], tr[-1]
        if su.plan.strided:
            p = fused.lde_strided(tr, tw_inv_small, n_inv_small,
                                  tw_fwd_big)
        else:
            p = fused.lde_fused(tr, tw_inv_small, n_inv_small, tw_fwd_big)
        p = barrier(p)
        if upto == "lde":
            return p
        k_tiled = jnp.tile(k_ext, (precision // k_ext.shape[0], 1))
        zni_tiled = jnp.tile(zni8, (precision // ext, 1))
        p_shift = jnp.roll(p, -ext, axis=0)
        c_ev = fl.sub(fl.sub(p_shift, fl.cube(p)), k_tiled)
        xs_minus_last = fl.sub(xs_big, last_l[None])
        d = fl.mul(fl.mul(c_ev, xs_minus_last), zni_tiled)
        slope = fl.mul(fl.sub(output_l, inp_l), islope_l)
        i_ev = fl.add(fl.sub(inp_l, slope)[None],
                      fl.mul(slope[None], xs_big))
        b_ev = fl.mul(fl.sub(p, i_ev), inv_z2)
        d, b_ev = barrier((d, b_ev))
        if upto == "constraints":
            return d
        mleaf = jnp.concatenate([b2.limbs_to_words(p),
                                 b2.limbs_to_words(d),
                                 b2.limbs_to_words(b_ev)], axis=-1)
        m_lvl1, m_rest, m_root = barrier(fused.tree_build(mleaf))
        if upto == "tree1":
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
        if upto == "lincomb":
            return l
        l_words = b2.limbs_to_words(l)
        l_lvl1, l_rest, l_root = barrier(fused.tree_build(l_words))
        if upto == "tree2":
            return l_root
        positions = td.pseudorandom_indices_dev(
            l_root, precision, cfg.spot_checks, exclude_multiples_of=ext)
        aug = jnp.stack([positions, (positions + ext) % precision],
                        axis=1).reshape(-1)
        main_bundle = fused.tree_bundle(mleaf, m_lvl1, m_rest, aug, logn)
        lc_bundle = fused.tree_bundle(l_words, l_lvl1, l_rest, positions,
                                      logn)
        main_bundle, lc_bundle = barrier((main_bundle, lc_bundle))
        if upto == "bundles":
            return main_bundle
        col_roots, col_bundles, row_bundles, final_vals = \
            fused.fri_commit_scan(l, l_words, l_lvl1, l_rest, l_root,
                                  fri_inv_pows, su.schedule, eta_l,
                                  inv4_l, cfg.fri_queries, ext)
        return col_roots

    return jax.jit(fn)


args = (ckpts, cs_expand, k_ext, su.zni8, su.h_pows, su.islope_l,
        su.last_l, su.one_l, plan.xs_big, plan.tw_inv_small,
        plan.n_inv_small, plan.tw_fwd_big, plan.fri_inv_pows, su.eta_l,
        su.inv4_l, su.inv_z2)

report = {"steps": STEPS, "floor_s": timing.transfer_floor()}
prev = 0.0
for name in ("expand", "lde", "constraints", "tree1", "lincomb", "tree2",
             "bundles", "fri"):
    t, _ = timing.timed(stage_chain(name), *args, reps=3)
    report[name] = {"cumulative_s": t, "delta_s": t - prev}
    print(f"{name:<12s} cum {t*1e3:8.1f} ms   delta {(t-prev)*1e3:8.1f} ms",
          flush=True)
    prev = t

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"prof_fused3_{LOG2}.json"), "w") as fh:
    json.dump(report, fh, indent=2)
