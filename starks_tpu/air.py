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
