"""General AIR (Algebraic Intermediate Representation) STARKs.

Generalizes the MiMC pipeline to multi-register traces with arbitrary
(degree <= 3) transition constraints and point boundary conditions — the
completed form of the reference's partial `starks/air.py` abstraction
(SURVEY.md §3.1 'AIR abstraction', [MED]: that file was experimental, so
this protocol is this framework's own design, kept structurally parallel
to the MiMC instance in prover.py so every device kernel is reused).

Protocol (w registers, m transition constraints, b bounded registers):
  - each register column is LDE'd over <G2> (8x blowup)
  - C_i = t_i(P(x), P(g1 x), K(x)) must vanish on trace rows except the
    last: D_i = C_i * (x - last) / (x^steps - 1)
  - for each register r with boundary points S_r: I_r interpolates them,
    Z_r = prod_{(xb,_) in S_r} (x - xb), B_r = (P_r - I_r) / Z_r
  - Merkle leaf = P_0..P_{w-1} || D_0..D_{m-1} || B_r... (32B each)
  - Fiat-Shamir weights k_j = blake2s(m_root || bytes([j])), j=1..:
    L = sum_i k_i D_i + sum_q (k' P/B_q + k'' P/B_q * x^steps)
  - 80 spot checks + FRI(L, deg < 2*steps), as in the MiMC instance.

Transition constraints are written against an `ops` namespace (add / sub
/ mul / cube and constant embedding) so the SAME definition evaluates
vectorized on device limb arrays in the prover and on scalar bigints in
the verifier — single source of truth for the AIR.
"""

import jax.numpy as jnp
import numpy as np

from .ops import kernels as kn
from .ops import limbs as fl
from .ops import ntt as ntt_mod
from .ops.merkle import MerkleTree, _hash_level
from .ops import blake2s as b2
from . import prover as pv
from .transcript import (pseudorandom_indices, challenge_int, special_x,
                         is_a_power_of_2, blake)
from .utils import hostfield as hf
from .utils.conversions import ints_to_limbs

MODULUS = fl.MODULUS


class DeviceOps:
    """Field ops on [N, 16] limb arrays (prover side)."""

    def __init__(self, n):
        self.n = n

    add = staticmethod(kn.add)
    sub = staticmethod(kn.sub)
    mul = staticmethod(kn.mul)
    cube = staticmethod(kn.cube)

    def const(self, c: int):
        return jnp.tile(jnp.asarray(ints_to_limbs([c % MODULUS])),
                        (self.n, 1))


class PallasOps:
    """Field ops on limb-major [16, N] arrays, each a VMEM-resident
    Pallas kernel (ops/plimbs.py) — the TPU AIR core's ops namespace.
    The same AIR `transition` definition traces through any of the
    three namespaces unchanged."""

    def __init__(self, n):
        self.n = n

    @staticmethod
    def add(a, b):
        from .ops import plimbs
        return plimbs.add_t(a, b)

    @staticmethod
    def sub(a, b):
        from .ops import plimbs
        return plimbs.sub_t(a, b)

    @staticmethod
    def mul(a, b):
        from .ops import plimbs
        return plimbs.mul_t(a, b)

    @staticmethod
    def cube(a):
        from .ops import plimbs
        return plimbs.cube_t(a)

    def const(self, c: int):
        from .utils.conversions import int_to_limbs
        return jnp.broadcast_to(
            jnp.asarray(int_to_limbs(c % MODULUS))[:, None],
            (fl.NUM_LIMBS, self.n))


class HostOps:
    """Field ops on Python ints (verifier side)."""

    @staticmethod
    def add(a, b):
        return (a + b) % MODULUS

    @staticmethod
    def sub(a, b):
        return (a - b) % MODULUS

    @staticmethod
    def mul(a, b):
        return (a * b) % MODULUS

    @staticmethod
    def cube(a):
        return pow(a, 3, MODULUS)

    def const(self, c: int):
        return c % MODULUS


class AIR:
    """An algebraic intermediate representation.

    width:        number of registers
    step_fn(state, consts) -> next state   (host ints; trace generation)
    transition(cur, nxt, consts, ops) -> [constraint values]
                  cur/nxt: per-register values; consts: per-constant-
                  column values; must be polynomial of total degree <= 3
    constants:    list of periodic constant columns (each a power-of-2
                  length list of ints, cycling over trace rows)
    boundaries(steps) -> list of (step, register) pairs whose trace
                  values are pinned as public boundary constraints
    """

    def __init__(self, width, step_fn, transition, num_constraints,
                 constants, boundary_points):
        self.width = width
        self.step_fn = step_fn
        self.transition = transition
        self.num_constraints = num_constraints
        self.constants = constants
        self.boundary_points = boundary_points

    def trace(self, inputs, steps):
        state = [x % MODULUS for x in inputs]
        assert len(state) == self.width
        rows = [state]
        for i in range(steps - 1):
            consts = [col[i % len(col)] for col in self.constants]
            state = self.step_fn(state, consts)
            rows.append([x % MODULUS for x in state])
        return rows


def prove_air(air: AIR, inputs, steps: int):
    """Generate [m_root, l_root, main_branches, lc_branches, fri_proof,
    boundary_values] for `air` on `inputs`."""
    assert is_a_power_of_2(steps)
    precision = steps * pv.EXTENSION_FACTOR
    G2 = pow(pv.GENERATOR, (MODULUS - 1) // precision, MODULUS)
    skips = pv.EXTENSION_FACTOR
    G1 = pow(G2, skips, MODULUS)
    timer = pv._StageTimer(f"prove_air steps={steps}")

    trace_rows = air.trace(inputs, steps)
    timer.mark("trace")

    d1 = ntt_mod.get_domain(steps, G1)
    d2 = ntt_mod.get_domain(precision, G2)

    # Per-register LDE.
    p_evals = []
    for r in range(air.width):
        col = [row[r] for row in trace_rows]
        ev, _ = ntt_mod.lde(jnp.asarray(ints_to_limbs(col)), d1, d2)
        p_evals.append(ev)
    timer.mark("lde")

    # Periodic constant extensions (host mini-NTTs, tiled on device).
    k_tiled = []
    for col in air.constants:
        skips2 = steps // len(col)
        mini = hf.host_ntt(list(col), pow(G1, skips2, MODULUS), inverse=True)
        ext = hf.host_ntt(mini, pow(G2, skips2, MODULUS))
        k_tiled.append(jnp.tile(jnp.asarray(ints_to_limbs(ext)),
                                (precision // len(ext), 1)))

    # Transition constraints -> quotients.
    ops = DeviceOps(precision)
    cur = p_evals
    nxt = [jnp.roll(ev, -skips, axis=0) for ev in p_evals]
    c_list = air.transition(cur, nxt, k_tiled, ops)
    assert len(c_list) == air.num_constraints

    last = pow(G2, (steps - 1) * skips, MODULUS)
    h = pow(G2, steps, MODULUS)
    zni8 = jnp.asarray(ints_to_limbs(
        [hf.inv(pow(h, i, MODULUS) - 1) for i in range(8)]))
    zni = jnp.tile(zni8, (precision // 8, 1))
    xs = d2.powers
    x_minus_last = kn.sub(xs, pv._const(last)[None])
    d_list = [kn.mul(kn.mul(c, x_minus_last), zni) for c in c_list]
    timer.mark("constraints/quotients")

    # Boundary polynomials per bounded register.
    bpoints = air.boundary_points(steps)
    by_reg = {}
    for (step, reg) in bpoints:
        by_reg.setdefault(reg, []).append(step)
    boundary_values = {(step, reg): trace_rows[step][reg]
                       for (step, reg) in bpoints}
    b_list, b_regs = [], []
    z_evals = []
    for reg in sorted(by_reg):
        xs_pts = [pow(G1, s, MODULUS) for s in by_reg[reg]]
        ys_pts = [trace_rows[s][reg] for s in by_reg[reg]]
        i_poly = hf.interp_many(xs_pts, ys_pts) if len(xs_pts) > 2 else (
            hf.line_through(xs_pts[0], ys_pts[0], xs_pts[1], ys_pts[1])
            if len(xs_pts) == 2 else [ys_pts[0]])
        # I_r evaluations via Horner on device (few coefficients).
        i_ev = ops.const(i_poly[-1])
        for coeff in reversed(i_poly[:-1]):
            i_ev = kn.mul_add(i_ev, xs, ops.const(coeff))
        z_r = None
        for xb in xs_pts:
            factor = kn.sub(xs, pv._const(xb)[None])
            z_r = factor if z_r is None else kn.mul(z_r, factor)
        b_regs.append(reg)
        b_list.append((kn.sub(p_evals[reg], i_ev), z_r))
        z_evals.append(z_r)
    # One batched inversion for ALL boundary vanishing polys.
    z_cat = jnp.concatenate(z_evals, axis=0)
    z_inv = kn.batch_inv(z_cat)
    b_final = [kn.mul(num, z_inv[i * precision:(i + 1) * precision])
               for i, (num, _) in enumerate(b_list)]
    timer.mark("boundaries")

    # Commit #1: leaf = all P || all D || all B columns.
    cols = p_evals + d_list + b_final
    leaf_words = jnp.concatenate([b2.limbs_to_words(c) for c in cols],
                                 axis=-1)
    mtree = MerkleTree(leaf_words)
    m_root = mtree.root
    timer.mark("merkle #1")

    # Fiat-Shamir linear combination.
    n_weights = len(d_list) + 2 * (air.width + len(b_final))
    ks = [challenge_int(m_root, j + 1) for j in range(n_weights)]
    coef8 = lambda k_lin, k_adj: jnp.tile(jnp.asarray(ints_to_limbs(
        [(k_lin + k_adj * pow(h, i, MODULUS)) % MODULUS for i in range(8)])),
        (precision // 8, 1))
    l_evals = None
    ki = iter(ks)
    for dcol in d_list:
        l_term = kn.mul(dcol, jnp.tile(jnp.asarray(
            ints_to_limbs([next(ki) % MODULUS])), (precision, 1)))
        l_evals = l_term if l_evals is None else kn.add(l_evals, l_term)
    for col in p_evals + b_final:
        c8 = coef8(next(ki), next(ki))
        l_evals = kn.add(l_evals, kn.mul(col, c8))
    l_mtree = MerkleTree.from_values(l_evals)
    l_root = l_mtree.root
    timer.mark("linear combination + merkle #2")

    positions = pseudorandom_indices(l_root, precision,
                                     pv.SPOT_CHECK_SECURITY_FACTOR,
                                     exclude_multiples_of=skips)
    augmented = sum([[x, (x + skips) % precision] for x in positions], [])
    main_branches = mtree.branches(augmented)
    lc_branches = l_mtree.branches(positions)
    timer.mark("spot-check branches")

    fri_proof = pv.prove_low_degree(l_evals, d2, steps * 2,
                                    exclude_multiples_of=skips)
    timer.mark("fri")

    public_boundary = sorted(boundary_values.items())
    return [m_root, l_root, main_branches, lc_branches, fri_proof,
            public_boundary]


class _FusedAIRSetup:
    """Per-(air, steps) static schedule + precomputed device tables for
    the ONE-DISPATCH AIR prover (`prove_air_fused`) — the AIR analog of
    prover._FusedSetup. Everything that does not depend on the claim's
    inputs is hoisted here: twiddle plans, periodic-constant extensions,
    x - last / Z-numerator-inverse tables, boundary Lagrange BASIS
    evaluations and 1/Z_r tables (boundary POINTS are part of the AIR;
    only boundary VALUES are traced per claim)."""

    _cache = {}

    def __init__(self, air: AIR, steps: int):
        import jax
        from .ops import fused
        from .ops import transcript_dev as td
        from .utils.conversions import int_to_limbs

        ext = pv.EXTENSION_FACTOR
        precision = steps * ext
        G2 = pow(pv.GENERATOR, (MODULUS - 1) // precision, MODULUS)
        G1 = pow(G2, ext, MODULUS)
        self.air, self.steps = air, steps
        self.precision, self.ext = precision, ext
        self.G1, self.G2 = G1, G2
        self.logn = precision.bit_length() - 1
        self.schedule = fused.fri_round_schedule(
            precision, steps * 2, pv.FRI_BASE_CUTOFF)
        self.rounds = len(self.schedule)
        self.n_final = precision // 4 ** self.rounds
        # Pallas + unrolled execution forms on TPU (round 4: AIR parity
        # with the MiMC core — same kernels, same gating rationale as
        # prover._FusedSetup).
        self.pallas = jax.default_backend() == "tpu"
        self.unrolled = self.pallas
        self.plan = fused.FusedPlan.get(steps, precision, G1, G2,
                                        self.rounds, pallas=self.pallas)

        last = pow(G2, (steps - 1) * ext, MODULUS)
        h = pow(G2, steps, MODULUS)
        xs = self.plan.xs_big
        t = {}
        t["x_minus_last"] = fl.sub(xs, jnp.asarray(int_to_limbs(last))[None])
        t["zni"] = jnp.tile(jnp.asarray(ints_to_limbs(
            [hf.inv(pow(h, i, MODULUS) - 1) for i in range(ext)])),
            (precision // ext, 1))
        self.h_pows = jnp.asarray(ints_to_limbs(
            [pow(h, i, MODULUS) for i in range(ext)]))
        self.eta_l = jnp.asarray(int_to_limbs(
            pow(G2, precision // 4, MODULUS)))
        self.inv4_l = jnp.asarray(int_to_limbs(hf.inv(4)))

        # Periodic constant extensions (host mini-NTTs, tiled).
        t["k_tables"] = []
        for col in air.constants:
            skips2 = steps // len(col)
            mini = hf.host_ntt(list(col), pow(G1, skips2, MODULUS),
                               inverse=True)
            extv = hf.host_ntt(mini, pow(G2, skips2, MODULUS))
            t["k_tables"].append(jnp.tile(
                jnp.asarray(ints_to_limbs(extv)),
                (precision // len(extv), 1)))

        # Boundary structure: basis/Z tables per bounded register.
        bpoints = air.boundary_points(steps)
        by_reg = {}
        for (step, reg) in bpoints:
            by_reg.setdefault(reg, []).append(step)
        self.b_regs = sorted(by_reg)
        self.b_steps = {reg: sorted(by_reg[reg]) for reg in self.b_regs}
        t["basis"] = []        # per reg: list of [N,16] basis evals
        t["inv_z"] = []        # per reg: [N,16] 1/Z_r evals
        for reg in self.b_regs:
            xs_pts = [pow(G1, s, MODULUS) for s in self.b_steps[reg]]
            basis_r = []
            for j, xj in enumerate(xs_pts):
                # L_j(x) = prod_{l!=j}(x - x_l) / (x_j - x_l)
                num = [1]
                denom = 1
                for l, xl in enumerate(xs_pts):
                    if l == j:
                        continue
                    num = hf._mul_linear(num, xl, MODULUS)
                    denom = denom * (xj - xl) % MODULUS
                scale = hf.inv(denom)
                coeffs = [c * scale % MODULUS for c in num]
                ev = jnp.tile(jnp.asarray(ints_to_limbs([coeffs[-1]])),
                              (precision, 1))
                for c in reversed(coeffs[:-1]):
                    ev = fl.add(fl.mul(ev, xs), jnp.tile(
                        jnp.asarray(ints_to_limbs([c])), (precision, 1)))
                basis_r.append(ev)
            t["basis"].append(basis_r)
            z = None
            for xb in xs_pts:
                factor = fl.sub(xs, jnp.asarray(int_to_limbs(xb))[None])
                z = factor if z is None else fl.mul(z, factor)
            t["inv_z"].append(jax.jit(fused.batch_inv_scan)(z))
        self.tables = t

        self.w = air.width
        self.nc = air.num_constraints
        self.nb = len(self.b_regs)
        self.leaf_cols = self.w + self.nc + self.nb
        self.main_leaf_words = 8 * self.leaf_cols
        self.n_weights = self.nc + 2 * (self.w + self.nb)
        lw = 8 * self.leaf_cols
        q = pv.FRI_QUERIES
        s = pv.SPOT_CHECK_SECURITY_FACTOR
        # Round 5: AIR payload parity with the MiMC core — pruned
        # branch bundles (tree top levels shipped once in tops_*
        # sections, spliced back on host by prover._complete_pruned)
        # and the balanced K-chunk flat D2H layout. Both cut the
        # fib-square 2^13 payload ~40% and kill the straggler tail
        # (prover.py round-4/4b comments for the full rationale).
        self.config = pv.REFERENCE
        self.prune_T = 7 if self.unrolled else 0
        self.t_main = fused.bundle_prune_depth(self.logn, self.prune_T)
        self.Wm = 2 * lw + 8 * (self.logn - 1 - self.t_main)
        self.Wl = 2 * 8 + 8 * (self.logn - 1 - self.t_main)
        self.Wc = 2 * 8 + 8 * (self.logn - 3)
        self.sections = [
            ("m_root", (8,)),
            ("l_root", (8,)),
            ("main_bundle", (2 * s, self.Wm)),
            ("lc_bundle", (s, self.Wl)),
            ("col_roots", (self.rounds, 8)),
        ]
        self.t_cols = []
        if self.unrolled:
            for r, (n_r, q_r) in enumerate(self.schedule):
                lognr = n_r.bit_length() - 1
                t_row = fused.bundle_prune_depth(lognr, self.prune_T)
                t_col = fused.bundle_prune_depth(lognr - 2,
                                                 self.prune_T)
                self.t_cols.append(t_col)
                wc = 2 * 8 + 8 * (lognr - 3 - t_col)
                wr = 2 * 8 + 8 * (lognr - 1 - t_row)
                self.sections += [(f"col_b{r}", (q, wc)),
                                  (f"row_b{r}", (4 * q, wr))]
        else:
            self.sections += [
                ("col_bundles", (self.rounds, q, self.Wc)),
                ("row_bundles", (self.rounds, 4 * q, self.Wl)),
            ]
        self.sections.append(("base_words", (self.n_final, 8)))
        if self.t_main > 0:
            self.sections += [
                ("tops_m", (2 ** (self.t_main + 1) - 2, 8)),
                ("tops_l", (2 ** (self.t_main + 1) - 2, 8)),
            ]
        for r, t_col in enumerate(self.t_cols):
            if t_col > 0:
                self.sections.append(
                    (f"tops_c{r}", (2 ** (t_col + 1) - 2, 8)))

        # Balanced K-chunk flat D2H layout (see prover._FusedSetup).
        self.flat_layout = []           # (name, offset_words, shape)
        off = 0
        for n, sh in self.sections:
            size = 1
            for d in sh:
                size *= d
            self.flat_layout.append((n, off, sh))
            off += size
        self.flat_words = off
        nbytes = 4 * off
        self.n_chunks = max(4, min(16, (nbytes + 49151) // 49152))
        cw = -(-off // self.n_chunks)
        self.chunk_words = (cw + 31) & ~31
        self._core = None

    @classmethod
    def get(cls, air: AIR, steps: int) -> "_FusedAIRSetup":
        # Keyed on AIR CONTENT, not object identity: the cached tables
        # bake in the constant columns and boundary points, so mutating
        # an AIR between prove calls must miss the cache (round-2
        # advisor finding). Callables are keyed by identity — replacing
        # step_fn/transition with new functions re-keys; mutating
        # captured state inside one does not (document: treat AIRs as
        # immutable, or call clear_cache()).
        key = (id(air.step_fn), id(air.transition), air.width,
               air.num_constraints,
               tuple(tuple(col) for col in air.constants),
               tuple(air.boundary_points(steps)), steps)
        if key not in cls._cache:
            cls._cache[key] = cls(air, steps)
        return cls._cache[key]

    @classmethod
    def clear_cache(cls):
        cls._cache.clear()

    def core(self):
        if self._core is not None:
            return self._core
        import jax
        from .ops import fused
        from .ops import transcript_dev as td

        air = self.air
        precision, ext, logn = self.precision, self.ext, self.logn
        plan, t = self.plan, self.tables
        schedule, n_final = self.schedule, self.n_final
        w, nc = self.w, self.nc
        b_regs = self.b_regs

        def emit(parts_list):
            """Section-ordered arrays -> K equal flat D2H chunks (the
            prover's round-4b layout; see _FusedSetup comments)."""
            flat = jnp.concatenate([p.reshape(-1) for p in parts_list])
            pad = self.n_chunks * self.chunk_words - flat.shape[0]
            if pad:
                flat = jnp.concatenate(
                    [flat, jnp.zeros((pad,), flat.dtype)])
            return tuple(jnp.split(flat, self.n_chunks))

        def pallas_core_fn(trace_pk, ys_l):
            # Limb-major Pallas AIR core (round 4): per-register Pallas
            # LDE, VMEM-resident transition/quotient/boundary/L maps,
            # unrolled trees + Pallas FRI. Bit-identical to prove_air
            # (tests/_air_impl.py).
            from .ops import plimbs
            barrier = jax.lax.optimization_barrier
            trace_l = fused.unpack_limbs(trace_pk)      # [steps, w, 16]
            inv_small_t = jnp.transpose(plan.tw_inv_small)
            xs_t = jnp.transpose(plan.xs_big)
            n_inv_s = plan.n_inv_small[:, None]
            p_cols = []
            for r in range(w):
                p = fused.lde_pl(jnp.transpose(barrier(trace_l[:, r])),
                                 inv_small_t, n_inv_s, xs_t)
                p_cols.append(barrier(p))               # [16, N] each

            # Transition constraints -> quotients (limb-major ops).
            nxt = [jnp.roll(p, -ext, axis=1) for p in p_cols]
            ops = PallasOps(precision)
            k_ts = [jnp.transpose(k) for k in t["k_tables"]]
            c_list = air.transition(p_cols, nxt, k_ts, ops)
            xml_t = jnp.transpose(t["x_minus_last"])
            zni_t = jnp.transpose(t["zni"])
            d_cols = [plimbs.mul_t(plimbs.mul_t(c, xml_t), zni_t)
                      for c in c_list]

            # Boundary columns from traced boundary VALUES.
            b_cols = []
            pt = 0
            for ri, reg in enumerate(b_regs):
                i_ev = None
                for basis_ev in t["basis"][ri]:
                    term = plimbs.scale_t(jnp.transpose(basis_ev),
                                          ys_l[pt][:, None])
                    i_ev = term if i_ev is None else plimbs.add_t(i_ev,
                                                                  term)
                    pt += 1
                b = plimbs.mul_t(plimbs.sub_t(p_cols[reg], i_ev),
                                 jnp.transpose(t["inv_z"][ri]))
                b_cols.append(b)
            d_cols = barrier(d_cols)
            b_cols = barrier(b_cols) if b_cols else b_cols

            # Commit #1: leaf = P cols || D cols || B cols.
            cols = p_cols + d_cols + b_cols
            mleaf = jnp.transpose(jnp.concatenate(
                [fused.limbs_to_words_t(c) for c in cols], axis=0))
            m_lvl1, m_rest, m_root = barrier(
                fused.tree_build_unrolled(mleaf))

            # Fiat-Shamir weights + linear combination.
            ks = [td.challenge_limbs(m_root, j + 1)
                  for j in range(self.n_weights)]
            ki = iter(ks)
            l = None
            for d in d_cols:
                term = plimbs.scale_t(d, next(ki)[:, None])
                l = term if l is None else plimbs.add_t(l, term)
            for col in p_cols + b_cols:
                coef = plimbs.tile_cols(jnp.transpose(
                    td.lincomb_coeffs(next(ki), next(ki), self.h_pows)),
                    2048)
                l = plimbs.add_t(l, plimbs.mul_tab_t(col, coef))
            l = barrier(l)

            l_words = jnp.transpose(fused.limbs_to_words_t(l))
            l_lvl1, l_rest, l_root = barrier(
                fused.tree_build_unrolled(l_words))

            positions = td.pseudorandom_indices_dev(
                l_root, precision, pv.SPOT_CHECK_SECURITY_FACTOR,
                exclude_multiples_of=ext)
            aug = jnp.stack([positions, (positions + ext) % precision],
                            axis=1).reshape(-1)
            main_bundle = fused.tree_bundle(mleaf, m_lvl1, m_rest, aug,
                                            logn,
                                            top_levels=self.t_main)
            lc_bundle = fused.tree_bundle(l_words, l_lvl1, l_rest,
                                          positions, logn,
                                          top_levels=self.t_main)
            main_bundle, lc_bundle = barrier((main_bundle, lc_bundle))

            res = fused.fri_commit_unrolled_pl(
                l, l_words, l_lvl1, l_rest, l_root,
                plan.fri_inv_pows, schedule, self.eta_l,
                self.inv4_l, pv.FRI_QUERIES, ext,
                top_levels=self.prune_T)
            if self.prune_T > 0:
                col_roots_l, col_bs, row_bs, final_t, col_tops = res
            else:
                col_roots_l, col_bs, row_bs, final_t = res
                col_tops = []
            col_roots = jnp.stack(col_roots_l)
            fri_parts = [x for pair in zip(col_bs, row_bs) for x in pair]
            base_words = jnp.transpose(fused.limbs_to_words_t(final_t))
            tops_parts = []
            if self.t_main > 0:
                tops_parts = [
                    fused.tree_tops(m_rest, logn, self.t_main),
                    fused.tree_tops(l_rest, logn, self.t_main),
                ] + col_tops

            parts = ([m_root, l_root, main_bundle, lc_bundle, col_roots]
                     + fri_parts + [base_words] + tops_parts)
            return emit(parts)

        def core_fn(trace_pk, ys_l):
            barrier = jax.lax.optimization_barrier
            trace_l = fused.unpack_limbs(trace_pk)      # [steps, w, 16]
            # Per-register LDE (fused iNTT -> zero-interleave -> NTT).
            p_cols = []
            for r in range(w):
                p = fused.lde_fused(barrier(trace_l[:, r]),
                                    plan.tw_inv_small, plan.n_inv_small,
                                    plan.tw_fwd_big)
                p_cols.append(barrier(p))

            # Transition constraints -> quotients.
            nxt = [jnp.roll(p, -ext, axis=0) for p in p_cols]
            ops = DeviceOps(precision)
            c_list = air.transition(p_cols, nxt, t["k_tables"], ops)
            d_cols = [fl.mul(fl.mul(c, t["x_minus_last"]), t["zni"])
                      for c in c_list]

            # Boundary columns from traced boundary VALUES.
            b_cols = []
            pt = 0
            for ri, reg in enumerate(b_regs):
                i_ev = None
                for basis_ev in t["basis"][ri]:
                    term = fl.mul(ys_l[pt][None], basis_ev)
                    i_ev = term if i_ev is None else fl.add(i_ev, term)
                    pt += 1
                b = fl.mul(fl.sub(p_cols[reg], i_ev), t["inv_z"][ri])
                b_cols.append(b)
            d_cols = barrier(d_cols)
            b_cols = barrier(b_cols) if b_cols else b_cols

            # Commit #1: leaf = P cols || D cols || B cols.
            cols = p_cols + d_cols + b_cols
            mleaf = jnp.concatenate([b2.limbs_to_words(c) for c in cols],
                                    axis=-1)
            m_lvl1, m_rest, m_root = barrier(fused.tree_build(mleaf))

            # Fiat-Shamir weights + linear combination.
            ks = [td.challenge_limbs(m_root, j + 1)
                  for j in range(self.n_weights)]
            ki = iter(ks)
            l = None
            for d in d_cols:
                term = fl.mul(d, next(ki)[None])
                l = term if l is None else fl.add(l, term)
            for col in p_cols + b_cols:
                coef = jnp.tile(
                    td.lincomb_coeffs(next(ki), next(ki), self.h_pows),
                    (precision // ext, 1))
                l = fl.add(l, fl.mul(col, coef))
            l = barrier(l)

            l_words = b2.limbs_to_words(l)
            l_lvl1, l_rest, l_root = barrier(fused.tree_build(l_words))

            positions = td.pseudorandom_indices_dev(
                l_root, precision, pv.SPOT_CHECK_SECURITY_FACTOR,
                exclude_multiples_of=ext)
            aug = jnp.stack([positions, (positions + ext) % precision],
                            axis=1).reshape(-1)
            main_bundle = fused.tree_bundle(mleaf, m_lvl1, m_rest, aug,
                                            logn)
            lc_bundle = fused.tree_bundle(l_words, l_lvl1, l_rest,
                                          positions, logn)
            main_bundle, lc_bundle = barrier((main_bundle, lc_bundle))

            col_roots, col_bundles, row_bundles, final_vals = \
                fused.fri_commit_scan(l, l_words, l_lvl1, l_rest, l_root,
                                      plan.fri_inv_pows, schedule,
                                      self.eta_l, self.inv4_l,
                                      pv.FRI_QUERIES, ext)
            base_words = b2.limbs_to_words(final_vals[:n_final])

            parts = [m_root, l_root, main_bundle, lc_bundle, col_roots,
                     col_bundles, row_bundles, base_words]
            return emit(parts)

        self._core_fn = pallas_core_fn if self.pallas else core_fn
        self._core = jax.jit(self._core_fn)
        return self._core

    def batch_core(self):
        """vmap of the AIR core over the claim axis: B proofs per
        dispatch from B packed traces + boundary-value vectors (the AIR
        analog of prover._FusedSetup.batch_core)."""
        import jax
        if getattr(self, "_batch_core", None) is None:
            self.core()
            self._batch_core = jax.jit(jax.vmap(self._core_fn,
                                                in_axes=(0, 0)))
        return self._batch_core


def prove_air_fused(air: AIR, inputs, steps: int):
    """One-dispatch AIR prover: the whole post-trace proof is a single
    jitted graph + one bulk device->host transfer (the AIR analog of
    `prover.mk_mimc_proof_fused`; device-resident Fiat-Shamir, no
    per-stage host round-trips). Proof objects are bit-identical to
    `prove_air` (tests/test_air.py)."""
    assert is_a_power_of_2(steps)
    su = _FusedAIRSetup.get(air, steps)

    trace_rows = air.trace(inputs, steps)
    from .ops import fused
    # Packed upload (2 u16 limbs per u32 word): halves the H2D bytes of
    # the [steps, w] trace on the ~25 MB/s tunnel.
    trace_pk = jnp.asarray(fused.pack_limbs_np(np.stack(
        [np.asarray(ints_to_limbs(row)) for row in trace_rows])))

    boundary_values = {(s, r): trace_rows[s][r]
                       for (s, r) in air.boundary_points(steps)}
    ys = [boundary_values[(s, reg)]
          for reg in su.b_regs for s in su.b_steps[reg]]
    ys_l = jnp.asarray(ints_to_limbs(ys)) if ys else \
        jnp.zeros((0, fl.NUM_LIMBS), jnp.uint32)

    from .prover import _fetch_prepped, _assemble_prepped
    pre = _fetch_prepped(su.core()(trace_pk, ys_l), su)
    proof = _assemble_prepped(pre, su)

    public_boundary = sorted(boundary_values.items())
    return proof + [public_boundary]


def verify_air(air: AIR, steps: int, proof) -> bool:
    """Verify an AIR proof against its public boundary values."""
    from .verifier import verify_branch, verify_low_degree_proof, _check

    (m_root, l_root, main_branches, lc_branches, fri_proof,
     public_boundary) = proof
    precision = steps * pv.EXTENSION_FACTOR
    G2 = pow(pv.GENERATOR, (MODULUS - 1) // precision, MODULUS)
    skips = pv.EXTENSION_FACTOR
    G1 = pow(G2, skips, MODULUS)
    m = MODULUS

    _check(verify_low_degree_proof(l_root, G2, fri_proof, steps * 2,
                                   exclude_multiples_of=skips), "FRI failed")

    boundary_values = dict(public_boundary)
    _check(set((s, r) for s, r in air.boundary_points(steps))
           == set(boundary_values), "boundary points mismatch")

    # Reconstruct per-register boundary interpolants.
    by_reg = {}
    for (step, reg) in boundary_values:
        by_reg.setdefault(reg, []).append(step)
    i_polys, z_points = {}, {}
    for reg in sorted(by_reg):
        xs_pts = [pow(G1, s, m) for s in sorted(by_reg[reg])]
        ys_pts = [boundary_values[(s, reg)] for s in sorted(by_reg[reg])]
        i_polys[reg] = hf.interp_many(xs_pts, ys_pts)
        z_points[reg] = xs_pts
    b_regs = sorted(by_reg)

    # Constant mini-polynomials.
    minis = []
    for col in air.constants:
        skips2 = steps // len(col)
        minis.append((hf.host_ntt(list(col), pow(G1, skips2, m),
                                  inverse=True), skips2))

    n_weights = air.num_constraints + 2 * (air.width + len(b_regs))
    ks = [challenge_int(m_root, j + 1) for j in range(n_weights)]

    positions = pseudorandom_indices(l_root, precision,
                                     pv.SPOT_CHECK_SECURITY_FACTOR,
                                     exclude_multiples_of=skips)
    last = pow(G2, (steps - 1) * skips, m)
    w, nc = air.width, air.num_constraints
    leaf_cols = w + nc + len(b_regs)
    ops = HostOps()

    for i, pos in enumerate(positions):
        x = pow(G2, pos, m)
        x_steps = pow(x, steps, m)
        leaf1 = verify_branch(m_root, pos, main_branches[2 * i])
        leaf2 = verify_branch(m_root, (pos + skips) % precision,
                              main_branches[2 * i + 1])
        _check(len(leaf1) == 32 * leaf_cols, "bad leaf width")
        vals1 = [int.from_bytes(leaf1[32 * j:32 * (j + 1)], 'big')
                 for j in range(leaf_cols)]
        vals2 = [int.from_bytes(leaf2[32 * j:32 * (j + 1)], 'big')
                 for j in range(leaf_cols)]
        p_vals, d_vals = vals1[:w], vals1[w:w + nc]
        b_vals = vals1[w + nc:]
        p_next = vals2[:w]
        l_of_x = verify_branch(l_root, pos, lc_branches[i], as_int=True)

        consts = [hf.eval_poly_at(mini, pow(x, skips2, m))
                  for (mini, skips2) in minis]
        c_vals = air.transition(p_vals, p_next, consts, ops)
        z = (pow(x, steps, m) - 1) * hf.inv(x - last) % m
        for c_val, d_val in zip(c_vals, d_vals):
            _check((c_val - z * d_val) % m == 0,
                   f"transition constraint fails at {pos}")

        for reg, b_val in zip(b_regs, b_vals):
            z2 = 1
            for xb in z_points[reg]:
                z2 = z2 * (x - xb) % m
            _check((p_vals[reg] - b_val * z2
                    - hf.eval_poly_at(i_polys[reg], x)) % m == 0,
                   f"boundary fails at {pos} reg {reg}")

        # Linear combination.
        acc = 0
        ki = iter(ks)
        for d_val in d_vals:
            acc = (acc + next(ki) * d_val) % m
        for q_val in p_vals + b_vals:
            acc = (acc + next(ki) * q_val + next(ki) * q_val * x_steps) % m
        _check((l_of_x - acc) % m == 0, f"linear combination fails at {pos}")
    return True
