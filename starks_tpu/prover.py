"""MiMC STARK prover: device bulk stages + host transcript orchestration.

TPU-native re-architecture of `starks/stark.py :: mk_mimc_proof`
(SURVEY.md §4.1). The pipeline is identical in MATH and transcript bytes;
the execution model is rebuilt for the hardware:

  reference (scalar, sequential)      -> this prover (array, device)
  ------------------------------------------------------------------
  per-element bigint loops            -> fused limb-kernel maps [N,16]
  recursive Python FFT                -> iterative batched NTT (ops/ntt)
  full-domain multi_inv for Z_num     -> 8-periodic host inverses, tiled
  full-domain powers list for x^steps -> 8-periodic tiling (G2^(8*steps)=1)
  k1..k4 folded in four muls          -> two muls via 8-periodic combined
                                         coefficients (k1+k2*x^steps), etc.
  sequential Merkle build             -> layer-parallel blake2s (ops/merkle)
  per-round quartic interpolation     -> closed-form fold4 kernel (ops/fri_fold)

Fiat-Shamir challenges, query-index derivation, branch assembly and the
proof object all run on host over device-computed roots, matching
SURVEY §A bit-exactly; the proof verifies under the oracle verifier
(tests/test_prover.py).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .ops import blake2s as b2
from .ops import limbs as fl
from .ops import ntt as ntt_mod
from .ops import kernels as kn
from .ops import transcript_dev as td
from .ops.fri_fold import fold4
from .ops.merkle import MerkleTree
from .models import mimc as mimc_model
from .transcript import (blake, pseudorandom_indices, challenge_int,
                         special_x, is_a_power_of_2)
from .utils import hostfield as hf
from .utils.conversions import (digest_words_to_bytes, int_to_limbs,
                                ints_to_limbs, limbs_to_ints)

from .config import StarkConfig, REFERENCE

MODULUS = fl.MODULUS
# Module-level views of the reference configuration (single source of
# truth: starks_tpu.config). Pass a custom StarkConfig to the entry
# points to override per call.
EXTENSION_FACTOR = REFERENCE.extension_factor
SPOT_CHECK_SECURITY_FACTOR = REFERENCE.spot_checks
GENERATOR = REFERENCE.generator
FRI_QUERIES = REFERENCE.fri_queries
FRI_BASE_CUTOFF = REFERENCE.fri_base_cutoff


def _const(x: int):
    return jnp.asarray(int_to_limbs(x % MODULUS))


_TIMING_ENV = "STARKS_TPU_STAGE_TIMING"


class _StageTimer:
    """Per-stage wall-clock observability (SURVEY §6: stage timers around
    host-side transcript steps). Enabled via STARKS_TPU_STAGE_TIMING=1;
    results always collected on the instance for programmatic use.

    JAX dispatch is async, so by default a stage's time lands wherever
    the host first waits (usually the final proof transfer).
    STARKS_TPU_STAGE_SYNC=1 makes `mark(stage, *arrays)` block on the
    stage's output arrays first, attributing device time to the stage
    that incurred it (profiling only — syncing serializes the pipeline)."""

    def __init__(self, name):
        import os
        import time
        self._time = time
        self.name = name
        self.verbose = os.environ.get(_TIMING_ENV) == "1"
        self.sync = os.environ.get("STARKS_TPU_STAGE_SYNC") == "1"
        self.t0 = time.time()
        self.last = self.t0
        self.stages = {}

    def mark(self, stage, *arrays):
        if self.sync and arrays:
            jax.block_until_ready(arrays)
        now = self._time.time()
        self.stages[stage] = now - self.last
        if self.verbose:
            print(f"[{self.name}] {stage:<28s} +{now - self.last:.2f}s",
                  flush=True)
        self.last = now

    def total(self):
        return self._time.time() - self.t0


LAST_PROOF_TIMINGS = {}


def _fri_device(values, domain: ntt_mod.Domain, maxdeg_plus_1: int,
                exclude_multiples_of: int, config: StarkConfig,
                tree: MerkleTree = None):
    """FRI commit/query phase entirely on device (SURVEY §4.3 math):
    fold-by-4 at the device-derived Fiat-Shamir point, per-round roots
    and branch bundles stay on device. Returns (rounds, base_words) with
    rounds = [(root_words, col_bundle, row_bundle, col_W, row_W), ...].
    `tree` reuses an existing commitment over `values` (the reference
    merkelizes L twice — here the L-tree is shared, same transcript)."""
    rounds = []
    while maxdeg_plus_1 > config.fri_base_cutoff:
        n = domain.n
        quarter = n // 4
        if tree is None:
            tree = MerkleTree.from_values(values)
        sx = td.special_x_limbs(tree.root_words)
        eta = _const(pow(domain.g, quarter, MODULUS))
        inv4 = _const(hf.inv(4))
        column = fold4(values, domain.powers, eta, sx, inv4)

        ctree = MerkleTree.from_values(column)
        ys = td.pseudorandom_indices_dev(
            ctree.root_words, quarter, config.fri_queries,
            exclude_multiples_of=exclude_multiples_of)
        col_bundle = ctree.branch_bundle(ys)
        row_idx = (ys[:, None]
                   + quarter * jnp.arange(4, dtype=jnp.int32)[None]
                   ).reshape(-1)
        row_bundle = tree.branch_bundle(row_idx)
        rounds.append((ctree.root_words, col_bundle, row_bundle,
                       ctree.leaf_width_words, tree.leaf_width_words))

        values, tree = column, ctree
        domain = ntt_mod.get_domain(quarter, pow(domain.g, 4, MODULUS))
        maxdeg_plus_1 //= 4
    return rounds, b2.limbs_to_words(values)


def _fetch_all(arrays):
    """ONE device->host transfer for a list of device arrays: flatten,
    concatenate, fetch, re-split. The tunneled runtime pays ~25 ms
    latency per transfer regardless of size (measured), so everything a
    proof sends to the host crosses in a single bulk copy."""
    flat = [a.reshape(-1) for a in arrays]
    buf = np.asarray(jnp.concatenate(flat)) if flat else np.zeros(0,
                                                                  np.uint32)
    out, off = [], 0
    for a in arrays:
        size = int(np.prod(a.shape))
        out.append(buf[off:off + size].reshape(a.shape))
        off += size
    return out


def _assemble_fri(rounds_fetched, base_words_np):
    """Host decode of fetched FRI round data into the reference-shaped
    nested proof (SURVEY §A.8)."""
    proof = []
    for root_w, col_bundle, row_bundle, col_W, row_W in rounds_fetched:
        col_branches = MerkleTree.bundle_to_branches(col_bundle, col_W)
        row_branches = MerkleTree.bundle_to_branches(row_bundle, row_W)
        branches = [[col_branches[i]] + row_branches[4 * i: 4 * i + 4]
                    for i in range(len(col_branches))]
        proof.append([digest_words_to_bytes(root_w), branches])
    proof.append([digest_words_to_bytes(r) for r in base_words_np])
    return proof


def prove_low_degree(values, domain: ntt_mod.Domain, maxdeg_plus_1: int,
                     exclude_multiples_of: int = 0,
                     config: StarkConfig = REFERENCE,
                     tree: MerkleTree = None):
    """FRI proof over device values: device-resident transcript, one
    device->host transfer. Returns the reference-shaped proof object."""
    if maxdeg_plus_1 <= config.fri_base_cutoff:
        return [[v.to_bytes(32, 'big')
                 for v in limbs_to_ints(np.asarray(values))]]
    rounds, base_words = _fri_device(values, domain, maxdeg_plus_1,
                                     exclude_multiples_of, config, tree)
    arrays = []
    for root_w, col_bundle, row_bundle, _, _ in rounds:
        arrays += [root_w, col_bundle, row_bundle]
    arrays.append(base_words)
    fetched = _fetch_all(arrays)
    rounds_fetched = [
        (fetched[3 * i], fetched[3 * i + 1], fetched[3 * i + 2],
         rounds[i][3], rounds[i][4]) for i in range(len(rounds))]
    return _assemble_fri(rounds_fetched, fetched[-1])


def mk_mimc_proof(inp: int, steps: int, round_constants, mesh=None,
                  config: StarkConfig = REFERENCE):
    """Full proof [m_root, l_root, main_branches, lc_branches, fri_proof]
    (SURVEY §A.8), bit-compatible with the reference transcript.

    With `mesh` (a Mesh carrying a "shard" axis), the evaluation-domain
    arrays are contiguously sharded across chips and both LDE NTTs run as
    sharded four-step transforms with all-to-all transposes over ICI
    (SURVEY §8 Phase 7); pointwise stages, Merkle levels and FRI folds
    ride GSPMD propagation of that sharding. Transcript bytes are
    IDENTICAL to the single-chip path (tested on an 8-device CPU mesh).
    """
    trace = mimc_model.trace_limbs(inp, steps, round_constants)
    return mk_mimc_proof_with_trace(inp, steps, round_constants, trace,
                                    mesh=mesh, config=config)


def mk_mimc_proof_with_trace(inp: int, steps: int, round_constants, trace,
                             mesh=None, config: StarkConfig = REFERENCE):
    """Proof from a precomputed trace (e.g. the batched device scan in
    parallel/batch.py, amortizing the sequential-trace Amdahl limit).
    `trace` is a list of ints or a [steps, 16] uint32 limb array."""
    if isinstance(trace, list):
        trace = ints_to_limbs(trace)
    ext = config.extension_factor
    assert steps <= 2**32 // ext
    assert is_a_power_of_2(steps) and is_a_power_of_2(len(round_constants))
    assert len(round_constants) < steps

    precision = steps * ext
    G2 = pow(config.generator, (MODULUS - 1) // precision, MODULUS)
    skips = precision // steps
    G1 = pow(G2, skips, MODULUS)
    timer = _StageTimer(f"prove steps={steps}")

    from .utils.conversions import limbs_to_int
    output = limbs_to_int(np.asarray(trace)[-1])
    timer.mark("trace")

    # 2-3. LDE on device.
    d1 = ntt_mod.get_domain(steps, G1)
    d2 = ntt_mod.get_domain(precision, G2)
    if mesh is None:
        p_evals, _ = ntt_mod.lde(jnp.asarray(trace), d1, d2)
    else:
        from .parallel import ntt4step
        from .parallel.mesh import shard_rows
        plan1 = ntt4step.get_plan(steps, G1, mesh)
        plan2 = ntt4step.get_plan(precision, G2, mesh)
        trace_dev = jax.device_put(jnp.asarray(trace), shard_rows(mesh))
        coeffs = ntt4step.fourstep_ntt(trace_dev, plan1, inverse=True)
        padded = ntt_mod.zero_pad(coeffs, precision)
        padded = jax.device_put(padded, shard_rows(mesh))
        p_evals = ntt4step.fourstep_ntt(padded, plan2)
    p_evals.block_until_ready()
    timer.mark("lde")

    # 4. Round-constant mini-polynomial extension (tiny; host NTT).
    skips2 = steps // len(round_constants)
    mini_poly = hf.host_ntt(list(round_constants), pow(G1, skips2, MODULUS),
                            inverse=True)
    k_ext = hf.host_ntt(mini_poly, pow(G2, skips2, MODULUS))

    # 5-9 precomputation (all 8-periodic scalars on host).
    last_step_position = pow(G2, (steps - 1) * skips, MODULUS)
    h = pow(G2, steps, MODULUS)                  # order = ext
    z_num_inv8 = [hf.inv(pow(h, i, MODULUS) - 1) for i in range(ext)]
    i_poly = hf.line_through(1, inp % MODULUS, last_step_position,
                             output % MODULUS)

    # The first commitment needs D and B; the k-weights need that root;
    # L needs the k-weights — so the pointwise work runs as two jitted
    # kernels with the Merkle root derivation in between.
    xs = d2.powers
    d_evals, b_evals = _stage_db(
        p_evals, xs,
        jnp.asarray(ints_to_limbs(k_ext)),
        jnp.asarray(ints_to_limbs(z_num_inv8)),
        _const(last_step_position), _const(1),
        jnp.asarray(ints_to_limbs([x % MODULUS for x in i_poly])),
        precision // len(k_ext), precision // ext, skips)
    b_evals.block_until_ready()
    timer.mark("constraints/quotient/boundary")

    # 8. Commit #1: 96-byte P||D||B leaves.
    mtree = MerkleTree.from_pdb(p_evals, d_evals, b_evals)
    timer.mark("merkle #1 (P||D||B)", mtree.root_words)

    # 9. Fiat-Shamir weights — derived ON DEVICE from the root words
    # (ops/transcript_dev.py): no host round-trip between commitments.
    k1L = td.challenge_limbs(mtree.root_words, 1)
    k2L = td.challenge_limbs(mtree.root_words, 2)
    k3L = td.challenge_limbs(mtree.root_words, 3)
    k4L = td.challenge_limbs(mtree.root_words, 4)
    h_pows = jnp.asarray(ints_to_limbs(
        [pow(h, i, MODULUS) for i in range(ext)]))
    coef_p8 = td.lincomb_coeffs(k1L, k2L, h_pows)
    coef_b8 = td.lincomb_coeffs(k3L, k4L, h_pows)
    l_evals = _stage_l(p_evals, d_evals, b_evals, coef_p8, coef_b8,
                       precision // ext)

    # 10. Commit #2.
    l_mtree = MerkleTree.from_values(l_evals)
    timer.mark("linear combination + merkle #2", l_mtree.root_words)

    # 11. Spot-check positions + branch bundles, all on device.
    positions_d = td.pseudorandom_indices_dev(
        l_mtree.root_words, precision, config.spot_checks,
        exclude_multiples_of=ext)
    augmented_d = jnp.stack(
        [positions_d, (positions_d + skips) % precision], axis=1
    ).reshape(-1)
    main_bundle = mtree.branch_bundle(augmented_d)
    lc_bundle = l_mtree.branch_bundle(positions_d)
    timer.mark("spot-check bundles", main_bundle, lc_bundle)

    # 12. FRI low-degree proof for L, deg < 2*steps (device; reuses the
    # L-tree commitment — the reference merkelizes L twice, same bytes).
    fri_rounds, fri_base = _fri_device(l_evals, d2, steps * 2, ext, config,
                                       tree=l_mtree)
    timer.mark("fri (device)", fri_base, *[r[0] for r in fri_rounds])

    # 13. ONE bulk device->host transfer for the whole proof, then host
    # byte assembly.
    arrays = [mtree.root_words, l_mtree.root_words, main_bundle, lc_bundle]
    for root_w, col_bundle, row_bundle, _, _ in fri_rounds:
        arrays += [root_w, col_bundle, row_bundle]
    arrays.append(fri_base)
    fetched = _fetch_all(arrays)
    timer.mark("proof transfer")

    m_root = digest_words_to_bytes(fetched[0])
    l_root = digest_words_to_bytes(fetched[1])
    main_branches = MerkleTree.bundle_to_branches(
        fetched[2], mtree.leaf_width_words)
    lc_branches = MerkleTree.bundle_to_branches(
        fetched[3], l_mtree.leaf_width_words)
    rounds_fetched = [
        (fetched[4 + 3 * i], fetched[5 + 3 * i], fetched[6 + 3 * i],
         fri_rounds[i][3], fri_rounds[i][4])
        for i in range(len(fri_rounds))]
    fri_proof = _assemble_fri(rounds_fetched, fetched[-1])
    timer.mark("proof assembly")
    LAST_PROOF_TIMINGS.clear()
    LAST_PROOF_TIMINGS.update(timer.stages)
    LAST_PROOF_TIMINGS["total"] = timer.total()

    return [m_root, l_root, main_branches, lc_branches, fri_proof]


def _stage_db(p_evals, xs, k_ext, z_num_inv8, last_b, one_b, i_ab,
              reps_k, reps_8, skips=REFERENCE.extension_factor):
    """Pointwise stage (SURVEY §4.1 steps 5-7) as a sequence of small
    jitted kernels (see ops/kernels.py for why not one fused graph)."""
    k_tiled = jnp.tile(k_ext, (reps_k, 1))
    zni_tiled = jnp.tile(z_num_inv8, (reps_8, 1))
    p_shift = jnp.roll(p_evals, -skips, axis=0)
    c = kn.sub_sub(p_shift, kn.cube(p_evals), k_tiled)
    xs_minus_last = kn.sub(xs, last_b[None])
    d = kn.mul(kn.mul(c, xs_minus_last), zni_tiled)
    i_ev = kn.affine(i_ab[0], i_ab[1], xs)
    z2 = kn.mul(kn.sub(xs, one_b[None]), xs_minus_last)
    b = kn.mul(kn.sub(p_evals, i_ev), kn.batch_inv(z2))
    return d, b


def _stage_l(p_evals, d_evals, b_evals, coef_p8, coef_b8, reps_8):
    """L = D + coef_p(x) * P + coef_b(x) * B (SURVEY §4.1 step 9)."""
    coef_p = jnp.tile(coef_p8, (reps_8, 1))
    coef_b = jnp.tile(coef_b8, (reps_8, 1))
    return kn.add(d_evals, kn.mul_add(p_evals, coef_p,
                                      kn.mul(b_evals, coef_b)))
