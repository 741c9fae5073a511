"""Pallas limb kernels (ops/plimbs.py) vs the XLA limb kernels.

On the CPU test backend the kernels run in Pallas interpret mode —
same math, bit-identical outputs (the compiled Mosaic path is the TPU
fast path, measured in scripts/exp_pmul.py / exp_pntt.py)."""

import random

import jax
import jax.numpy as jnp
import numpy as np

from starks_tpu.ops import limbs as fl
from starks_tpu.ops import plimbs
from starks_tpu.utils.conversions import ints_to_limbs


def _rand(n, seed):
    r = random.Random(seed)
    return jnp.asarray(ints_to_limbs(
        [r.randrange(fl.MODULUS) for _ in range(n)]))


class TestPallasLimbs:
    def test_mul_matches(self):
        n = 512
        a, b = _rand(n, 1), _rand(n, 2)
        want = np.asarray(jax.jit(fl.mul)(a, b))
        got = np.asarray(plimbs.from_limb_major(
            plimbs.mul_t(plimbs.to_limb_major(a),
                         plimbs.to_limb_major(b), blk=256)))
        assert np.array_equal(got, want)

    def test_mul_edge_values(self):
        vals = [0, 1, 2, fl.MODULUS - 1, fl.MODULUS - 2,
                2 ** 255, 2 ** 256 - 351 * 2 ** 32,  # == p - 1 + 0
                (1 << 240) - 1]
        pairs = [(x, y) for x in vals for y in vals]
        a = jnp.asarray(ints_to_limbs([x % fl.MODULUS for x, _ in pairs]))
        b = jnp.asarray(ints_to_limbs([y % fl.MODULUS for _, y in pairs]))
        want = np.asarray(jax.jit(fl.mul)(a, b))
        got = np.asarray(plimbs.from_limb_major(
            plimbs.mul_t(plimbs.to_limb_major(a),
                         plimbs.to_limb_major(b), blk=64)))
        assert np.array_equal(got, want)

    def test_dif_stage_matches(self):
        n = 256
        a, b, tw = _rand(n, 3), _rand(n, 4), _rand(n, 5)
        want_u = np.asarray(jax.jit(fl.add)(a, b))
        want_v = np.asarray(jax.jit(fl.mul)(jax.jit(fl.sub)(a, b), tw))
        u, v = plimbs.dif_stage_t(plimbs.to_limb_major(a),
                                  plimbs.to_limb_major(b),
                                  plimbs.to_limb_major(tw), blk=128)
        assert np.array_equal(np.asarray(plimbs.from_limb_major(u)),
                              want_u)
        assert np.array_equal(np.asarray(plimbs.from_limb_major(v)),
                              want_v)

    def test_dit_stage_matches(self):
        n = 256
        a, b, tw = _rand(n, 6), _rand(n, 7), _rand(n, 8)
        wv = jax.jit(fl.mul)(tw, b)
        want_u = np.asarray(jax.jit(fl.add)(a, wv))
        want_v = np.asarray(jax.jit(fl.sub)(a, wv))
        u, v = plimbs.dit_stage_t(plimbs.to_limb_major(a),
                                  plimbs.to_limb_major(b),
                                  plimbs.to_limb_major(tw), blk=128)
        assert np.array_equal(np.asarray(u).T, want_u)
        assert np.array_equal(np.asarray(v).T, want_v)

    def test_dif_stage_x_matches(self):
        n = 256
        x, tw = _rand(n, 9), _rand(n // 2, 10)
        a, b = x[:n // 2], x[n // 2:]
        want_u = np.asarray(jax.jit(fl.add)(a, b))
        want_v = np.asarray(jax.jit(fl.mul)(jax.jit(fl.sub)(a, b), tw))
        u, v = plimbs.dif_stage_x(plimbs.to_limb_major(x).copy(),
                                  plimbs.to_limb_major(tw).copy(),
                                  blk=64)
        assert np.array_equal(np.asarray(u).T, want_u)
        assert np.array_equal(np.asarray(v).T, want_v)

    def test_scale_matches(self):
        n = 256
        x, s = _rand(n, 11), _rand(1, 12)
        want = np.asarray(jax.jit(fl.mul)(x, jnp.broadcast_to(s, x.shape)))
        got = plimbs.scale_t(plimbs.to_limb_major(x).copy(),
                             plimbs.to_limb_major(s).copy(), blk=128)
        assert np.array_equal(np.asarray(got).T, want)


class TestPallasMaps:
    def test_db_map_matches(self):
        n = 512
        ext = 8
        p_ = _rand(n, 20)
        pr = jnp.roll(p_, -ext, axis=0)
        xs = _rand(n, 21)
        k8 = _rand(64, 22)       # period-64 table
        zni = _rand(ext, 23)
        iz2 = _rand(n, 24)
        last, slope, ia = _rand(1, 25)[0], _rand(1, 26)[0], _rand(1, 27)[0]

        k_tiled = jnp.tile(k8, (n // 64, 1))
        zni_tiled = jnp.tile(zni, (n // ext, 1))
        c = fl.sub(fl.sub(pr, fl.cube(p_)), k_tiled)
        want_d = np.asarray(jax.jit(
            lambda: fl.mul(fl.mul(c, fl.sub(xs, last[None])), zni_tiled))())
        i_ev = fl.add(ia[None], fl.mul(slope[None], xs))
        want_b = np.asarray(jax.jit(
            lambda: fl.mul(fl.sub(p_, i_ev), iz2))())

        blk = 128
        d_t, b_t = plimbs.db_map_t(
            p_.T.copy(), pr.T.copy(), xs.T.copy(),
            plimbs.tile_cols(k8.T.copy(), blk),
            plimbs.tile_cols(zni.T.copy(), blk),
            iz2.T.copy(), last[:, None], slope[:, None], ia[:, None],
            blk=blk)
        assert np.array_equal(np.asarray(d_t).T, want_d)
        assert np.array_equal(np.asarray(b_t).T, want_b)

    def test_l_map_matches(self):
        n = 256
        ext = 8
        d_, p_, b_ = _rand(n, 30), _rand(n, 31), _rand(n, 32)
        cp8, cb8 = _rand(ext, 33), _rand(ext, 34)
        cp = jnp.tile(cp8, (n // ext, 1))
        cb = jnp.tile(cb8, (n // ext, 1))
        want = np.asarray(jax.jit(
            lambda: fl.add(d_, fl.add(fl.mul(p_, cp), fl.mul(b_, cb))))())
        blk = 128
        got = plimbs.l_map_t(d_.T.copy(), p_.T.copy(), b_.T.copy(),
                             plimbs.tile_cols(cp8.T.copy(), blk),
                             plimbs.tile_cols(cb8.T.copy(), blk), blk=blk)
        assert np.array_equal(np.asarray(got).T, want)

    def test_fold4_matches(self):
        from starks_tpu.ops.fri_fold import fold4
        from starks_tpu.ops import ntt as ntt_mod
        from starks_tpu.ops import transcript_dev as td
        from starks_tpu.utils import hostfield as hf
        from starks_tpu.utils.conversions import int_to_limbs
        n = 1024
        MOD = fl.MODULUS
        G2 = pow(7, (MOD - 1) // n, MOD)
        dom = ntt_mod.get_domain(n, G2)
        values = _rand(n, 40)
        eta = jnp.asarray(int_to_limbs(pow(G2, n // 4, MOD)))
        inv4 = jnp.asarray(int_to_limbs(hf.inv(4)))
        sx = _rand(1, 41)[0]
        want = np.asarray(jax.jit(fold4)(values, dom.powers, eta, sx,
                                         inv4))
        # the prover's per-round u-table: g^-i for i < n/4
        inv_pows = np.asarray(
            jnp.concatenate([dom.powers[:1], dom.powers[:0:-1]], axis=0)
        )[:n // 4]
        got = plimbs.fold4_t(values.T.copy(),
                             jnp.asarray(inv_pows).T.copy(),
                             sx[:, None], eta[:, None], inv4[:, None],
                             blk=128)
        assert np.array_equal(np.asarray(got).T, want)


class TestPallasNTT:
    def test_ntt_dif_dit_match_fused(self):
        from starks_tpu.ops import fused
        n = 512
        MOD = fl.MODULUS
        g = pow(7, (MOD - 1) // n, MOD)
        table = fused._power_table_np(g, n)
        tw_stack = jnp.asarray(fused._stacked_twiddles(table))
        x = _rand(n, 50)
        want_dif = np.asarray(jax.jit(fused.ntt_dif)(x, tw_stack))
        got_dif = np.asarray(jax.jit(fused.ntt_dif_pl)(
            x.T.copy(), jnp.asarray(table).T.copy()))
        assert np.array_equal(got_dif.T, want_dif)

        want_dit = np.asarray(jax.jit(fused.ntt_dit)(x, tw_stack))
        got_dit = np.asarray(jax.jit(fused.ntt_dit_pl)(
            x.T.copy(), jnp.asarray(table).T.copy()))
        assert np.array_equal(got_dit.T, want_dit)

    def test_lde_pl_matches_fused(self):
        from starks_tpu.ops import fused
        steps, ext = 64, 8
        precision = steps * ext
        MOD = fl.MODULUS
        G2 = pow(7, (MOD - 1) // precision, MOD)
        G1 = pow(G2, ext, MOD)
        plan = fused.FusedPlan.get(steps, precision, G1, G2, 2)
        plan_pl = fused.FusedPlan.get(steps, precision, G1, G2, 2,
                                      pallas=True)
        trace = _rand(steps, 51)
        want = np.asarray(jax.jit(fused.lde_fused)(
            trace, plan.tw_inv_small, plan.n_inv_small, plan.tw_fwd_big))
        got = np.asarray(jax.jit(fused.lde_pl)(
            trace.T.copy(), jnp.transpose(plan_pl.tw_inv_small),
            plan_pl.n_inv_small[:, None],
            jnp.transpose(plan_pl.xs_big)))
        assert np.array_equal(got.T, want)

    def test_limbs_to_words_t(self):
        from starks_tpu.ops import fused
        from starks_tpu.ops import blake2s as b2
        x = _rand(64, 52)
        want = np.asarray(b2.limbs_to_words(x))
        got = np.asarray(fused.limbs_to_words_t(x.T.copy()))
        assert np.array_equal(got.T, want)
