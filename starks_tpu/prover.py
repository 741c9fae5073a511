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


def _fetch_flat(arr):
    """Fastest measured D2H path for a single device array on the
    tunneled runtime (scripts/exp_r4par.json): np.asarray takes a slow
    copy path (53 ms for 557 kB) while an explicit copy_to_host_async
    followed by jax.device_get streams at the wire rate (33 ms for the
    same buffer, of which ~25 ms is irreducible RPC latency)."""
    try:
        arr.copy_to_host_async()
    except Exception:
        pass                      # CPU arrays / older runtimes: no-op
    return np.ascontiguousarray(jax.device_get(arr))


def _fetch_all(arrays):
    """ONE device->host transfer for a list of device arrays: flatten,
    concatenate, fetch, re-split. The tunneled runtime pays ~25 ms
    latency per transfer regardless of size (measured), so everything a
    proof sends to the host crosses in a single bulk copy."""
    flat = [a.reshape(-1) for a in arrays]
    buf = _fetch_flat(jnp.concatenate(flat)) if flat else np.zeros(
        0, np.uint32)
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

    Single-chip proofs run the ONE-DISPATCH fused core (`_fused_core`):
    trace scan, LDE, constraints, Merkle commitments, Fiat-Shamir and
    the full FRI execute as a single jitted graph with a single bulk
    device->host transfer (see ops/fused.py for why).

    With `mesh` (a Mesh carrying a "shard" axis), the evaluation-domain
    arrays are contiguously sharded across chips and both LDE NTTs run as
    sharded four-step transforms with all-to-all transposes over ICI
    (SURVEY §8 Phase 7); pointwise stages, Merkle levels and FRI folds
    ride GSPMD propagation of that sharding. Transcript bytes are
    IDENTICAL to the single-chip path (tested on an 8-device CPU mesh).
    """
    if mesh is None:
        return mk_mimc_proof_fused(inp, steps, round_constants,
                                   config=config)
    trace = mimc_model.trace_limbs(inp, steps, round_constants)
    return mk_mimc_proof_with_trace(inp, steps, round_constants, trace,
                                    mesh=mesh, config=config)


def mk_mimc_proof_with_trace(inp: int, steps: int, round_constants, trace,
                             mesh=None, config: StarkConfig = REFERENCE):
    """Proof from a precomputed trace. `trace` is a list of ints or a
    [steps, 16] uint32 limb array. Single-chip (mesh=None) runs the
    fused one-dispatch core fed by trace checkpoints; with a mesh the
    staged sharded path below runs (four-step NTTs over ICI).

    CHECKPOINT SEMANTICS (mesh=None): the fused core uploads only every
    trace_K-th state of `trace` and regenerates the intermediate states
    on device from `round_constants` (fused.expand_trace). A trace that
    does not satisfy the MiMC recurrence x_{i+1} = x_i^3 + c_i is
    therefore silently corrected at non-checkpoint rows — the resulting
    proof attests the RECURRENCE-CONSISTENT trace through the supplied
    checkpoints, not the verbatim array. (The mesh path proves the
    supplied trace verbatim.) Callers proving deliberately inconsistent
    traces should use the staged mesh path or verify the trace first."""
    if isinstance(trace, list):
        trace = ints_to_limbs(trace)
    if mesh is None:
        return _prove_from_trace_fused(np.asarray(trace), steps,
                                       round_constants, config)
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


# ---------------------------------------------------------------------------
# One-dispatch fused prover (ops/fused.py)
# ---------------------------------------------------------------------------

class _FusedSetup:
    """Per-(steps, config) static schedule + host-precomputed constants
    + device twiddle plan for the one-dispatch prover core."""

    _cache = {}

    def __init__(self, steps: int, config: StarkConfig,
                 unrolled: bool = None, pallas: bool = None):
        self._unrolled_override = unrolled
        from .ops import fused
        ext = config.extension_factor
        precision = steps * ext
        G2 = pow(config.generator, (MODULUS - 1) // precision, MODULUS)
        G1 = pow(G2, ext, MODULUS)
        self.steps = steps
        self.config = config
        self.precision = precision
        self.ext = ext
        self.G1, self.G2 = G1, G2
        self.logn = precision.bit_length() - 1
        self.schedule = fused.fri_round_schedule(
            precision, steps * 2, config.fri_base_cutoff)
        self.rounds = len(self.schedule)
        self.n_final = precision // 4 ** self.rounds
        # Pallas limb kernels in the hot path (round 4): compiled Mosaic
        # on TPU; the CPU test backend keeps the XLA forms by default
        # (interpret-mode Pallas is exercised by dedicated tiny tests).
        self.pallas = (jax.default_backend() == "tpu"
                       if pallas is None else pallas)
        self.plan = fused.FusedPlan.get(steps, precision, G1, G2,
                                        self.rounds, pallas=self.pallas)

        last = pow(G2, (steps - 1) * ext, MODULUS)
        h = pow(G2, steps, MODULUS)
        self.last_l = jnp.asarray(int_to_limbs(last))
        self.one_l = jnp.asarray(int_to_limbs(1))
        self.islope_l = jnp.asarray(int_to_limbs(hf.inv(last - 1)))
        self.zni8 = jnp.asarray(ints_to_limbs(
            [hf.inv(pow(h, i, MODULUS) - 1) for i in range(ext)]))
        self.h_pows = jnp.asarray(ints_to_limbs(
            [pow(h, i, MODULUS) for i in range(ext)]))
        self.eta_l = jnp.asarray(int_to_limbs(
            pow(G2, precision // 4, MODULUS)))
        self.inv4_l = jnp.asarray(int_to_limbs(hf.inv(4)))

        # Checkpoint stride for host-trace feeding (see traced_core):
        # K dependent on-device rounds regenerate each segment; the H2D
        # upload is steps/K states. K=64 balances the ~150us/step
        # dependent-latency floor against the ~25 MB/s tunnel.
        self.trace_K = min(64, steps)
        self.n_ckpt = steps // self.trace_K

        # 1/Z2 where Z2(x) = (x-1)(x-last): a PURE CONSTANT of the
        # config (independent of inp/output), so the per-proof
        # batch-inversion the staged path ran in-graph is hoisted to a
        # one-time device computation here (cached with the setup).
        # Chunked: the blocked batch-inversion materializes ~6x its
        # input in HLO temps (prefix/suffix stacks), which OOMs HBM at
        # the 2^23-point domain in one piece (measured: 17.1 GB).
        from .ops import fused as _fused

        @jax.jit
        def _invz2_chunk(xs_c, one_l, last_l):
            z2 = fl.mul(fl.sub(xs_c, one_l[None]),
                        fl.sub(xs_c, last_l[None]))
            return _fused.batch_inv_scan(z2)

        CH = min(precision, 1 << 20)
        parts = [_invz2_chunk(self.plan.xs_big[lo:lo + CH], self.one_l,
                              self.last_l)
                 for lo in range(0, precision, CH)]
        self.inv_z2 = parts[0] if len(parts) == 1 else jnp.concatenate(
            parts)

        # Execution-form choice: statically-unrolled trees + FRI rounds
        # (true shapes, no padded scan carries, true-width bundles) on
        # the TPU backend for small/mid domains. The scan forms remain
        # for (a) XLA:CPU, whose compile time explodes on unrolled tree
        # levels, and (b) big strided plans, where the unrolled 2^23-
        # domain graph OOM-killed the remote TPU compile service
        # (SIGKILL; the scan+lean-mul form compiles and runs there).
        # Bit-identical either way, cross-tested. Pallas cores always
        # use the unrolled layout: their FRI form emits true per-round
        # widths, and the graph stays small (kernels are opaque).
        self.unrolled = (jax.default_backend() != "cpu"
                         and not self.plan.strided) or self.pallas
        if self._unrolled_override is not None:
            self.unrolled = self._unrolled_override

        # Output-vector layout (static widths, host decode).
        #
        # Unrolled/Pallas path (round 4): branch bundles omit the top
        # `prune` sibling levels of each tree — those entries repeat
        # across the 40-160 queries per tree, so the core ships each
        # tree's top levels ONCE (tops_* sections) and the host splices
        # siblings back by replaying the Fiat-Shamir positions
        # (_complete_branches). Cuts the per-proof D2H payload ~40% on
        # the ~37 MB/s tunnel (scripts/exp_r4fetch3.json timeline).
        self.prune_T = 7 if self.unrolled else 0
        self.t_main = fused.bundle_prune_depth(self.logn, self.prune_T)
        self.Wm = 2 * 24 + 8 * (self.logn - 1 - self.t_main)
        self.Wl = 2 * 8 + 8 * (self.logn - 1 - self.t_main)
        self.Wc = 2 * 8 + 8 * (self.logn - 3)
        self.Wr = 2 * 8 + 8 * (self.logn - 1)
        q = config.fri_queries
        s = config.spot_checks
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
                t_col = fused.bundle_prune_depth(lognr - 2, self.prune_T)
                self.t_cols.append(t_col)
                wc = 2 * 8 + 8 * (lognr - 3 - t_col)
                wr = 2 * 8 + 8 * (lognr - 1 - t_row)
                self.sections += [(f"col_b{r}", (q, wc)),
                                  (f"row_b{r}", (4 * q, wr))]
        else:
            self.sections += [
                ("col_bundles", (self.rounds, q, self.Wc)),
                ("row_bundles", (self.rounds, 4 * q, self.Wr)),
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

        # D2H output layout (round 4b): K EQUAL flat chunks of the
        # whole section-ordered payload. The tunnel's PER-STREAM rate
        # (~7-10 MB/s) — not its aggregate (~55 MB/s across 4-16
        # streams, exp_r4par.json) — bounds the LAST arrival, so the
        # earlier uneven per-section buffers left a straggler tail:
        # exp_r5timeline.json shows the 94 kB small-pack landing
        # 8-13 ms after the bundle buffers. Equal chunks collapse all
        # arrivals onto floor + total_bytes/aggregate_BW; the host
        # decodes each section as soon as the prefix of chunks
        # covering it has landed (sections stay in emit order).
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
        # ~48 kB per stream saturates aggregate BW without spilling
        # the 16-thread fetch pool (exp_r4prune.json).
        self.n_chunks = max(4, min(16, (nbytes + 49151) // 49152))
        cw = -(-off // self.n_chunks)
        self.chunk_words = (cw + 31) & ~31   # deterministic pad edge
        self._core = None

    @classmethod
    def get(cls, steps: int, config: StarkConfig) -> "_FusedSetup":
        key = (steps, config)
        if key not in cls._cache:
            cls._cache[key] = cls(steps, config)
        return cls._cache[key]

    def expand_consts(self, round_constants):
        """[K, S, 16] device table for fused.expand_trace:
        entry [j, s] = c[(s*K + j) % n_c]. Depends only on the constant
        list (not the input), cached per list like k_ext_limbs."""
        key = tuple(round_constants)
        cache = getattr(self, "_expc_cache", None)
        if cache is None:
            cache = self._expc_cache = {}
        if key not in cache:
            K, S = self.trace_K, self.n_ckpt
            n_c = len(round_constants)
            cs = np.asarray(ints_to_limbs(
                [c % MODULUS for c in round_constants]))
            idx = (np.arange(S)[None, :] * K + np.arange(K)[:, None]) % n_c
            cache[key] = jnp.asarray(cs[idx])
        return cache[key]

    def k_ext_limbs(self, round_constants):
        """Round-constant mini-polynomial extension K over the 8x domain
        (SURVEY §4.1 step 4) — tiny host NTT, cached per constant list."""
        key = tuple(round_constants)
        cache = getattr(self, "_kext_cache", None)
        if cache is None:
            cache = self._kext_cache = {}
        if key not in cache:
            skips2 = self.steps // len(round_constants)
            mini = hf.host_ntt(list(round_constants),
                               pow(self.G1, skips2, MODULUS), inverse=True)
            k_ext = hf.host_ntt(mini, pow(self.G2, skips2, MODULUS))
            cache[key] = jnp.asarray(
                ints_to_limbs([x % MODULUS for x in k_ext]))
        return cache[key]

    def core(self):
        """The jitted one-dispatch proof core (compiled once per steps;
        persisted by the compilation cache)."""
        if self._core is not None:
            return self._core
        from .ops import fused

        steps, precision = self.steps, self.precision
        ext, logn = self.ext, self.logn
        schedule = self.schedule
        cfg = self.config
        n_final = self.n_final

        def emit(parts_list):
            """Section-ordered arrays -> D2H output tuple: K equal
            flat chunks of the concatenated payload (see the layout
            comment in __init__ — equal streams kill the straggler
            tail on the per-stream-limited tunnel)."""
            flat = jnp.concatenate(
                [p.reshape(-1) for p in parts_list])
            pad = self.n_chunks * self.chunk_words - flat.shape[0]
            if pad:
                flat = jnp.concatenate(
                    [flat, jnp.zeros((pad,), flat.dtype)])
            return tuple(jnp.split(flat, self.n_chunks))

        def post_trace_fn(trace, k_ext, zni8, h_pows, islope_l,
                          last_l, one_l, xs_big, tw_inv_small,
                          n_inv_small, tw_fwd_big, fri_inv_pows, eta_l,
                          inv4_l, inv_z2):
            # Stage seams are fenced with optimization_barrier: XLA's
            # scheduler otherwise fuses scan-structured stages into one
            # another's contexts, compiling pathologically slow graphs.
            # Barriers pin each scan-structured stage as its own
            # schedulable unit.
            barrier = jax.lax.optimization_barrier
            inp_l = trace[0]
            output_l = trace[-1]

            # 2-3. LDE (strided-twiddle form above FusedPlan's memory
            # threshold; bit-identical, tested).
            if self.plan.strided:
                p = fused.lde_strided(trace, tw_inv_small, n_inv_small,
                                      tw_fwd_big)
            else:
                p = fused.lde_fused(trace, tw_inv_small, n_inv_small,
                                    tw_fwd_big)
            p = barrier(p)

            # 5-7. Constraint / quotient / boundary (steps 5-7): all
            # 8-periodic scalars were host-precomputed; the boundary
            # interpolant through (1, inp), (last, output) is built
            # in-graph from the traced output.
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

            # 8. Commit #1 (96-byte P||D||B leaves).
            mleaf = jnp.concatenate([b2.limbs_to_words(p),
                                     b2.limbs_to_words(d),
                                     b2.limbs_to_words(b_ev)], axis=-1)
            tree_fn = (fused.tree_build_unrolled if self.unrolled
                       else fused.tree_build)
            m_lvl1, m_rest, m_root = barrier(tree_fn(mleaf))

            # 9. Fiat-Shamir weights + linear combination (step 9).
            k1 = td.challenge_limbs(m_root, 1)
            k2 = td.challenge_limbs(m_root, 2)
            k3 = td.challenge_limbs(m_root, 3)
            k4 = td.challenge_limbs(m_root, 4)
            coef_p = jnp.tile(td.lincomb_coeffs(k1, k2, h_pows),
                              (precision // ext, 1))
            coef_b = jnp.tile(td.lincomb_coeffs(k3, k4, h_pows),
                              (precision // ext, 1))
            l = barrier(
                fl.add(d, fl.add(fl.mul(p, coef_p), fl.mul(b_ev, coef_b))))

            # 10. Commit #2.
            l_words = b2.limbs_to_words(l)
            l_lvl1, l_rest, l_root = barrier(tree_fn(l_words))

            # 11. Spot checks (step 11).
            positions = td.pseudorandom_indices_dev(
                l_root, precision, cfg.spot_checks,
                exclude_multiples_of=ext)
            aug = jnp.stack([positions, (positions + ext) % precision],
                            axis=1).reshape(-1)
            main_bundle = fused.tree_bundle(mleaf, m_lvl1, m_rest, aug,
                                            logn, top_levels=self.t_main)
            lc_bundle = fused.tree_bundle(l_words, l_lvl1, l_rest,
                                          positions, logn,
                                          top_levels=self.t_main)
            main_bundle, lc_bundle = barrier((main_bundle, lc_bundle))

            # 12. FRI (step 12): statically unrolled over rounds on the
            # TPU path (true shapes/widths), one scan on XLA:CPU.
            tops_parts = []
            if self.unrolled:
                col_roots_l, col_bs, row_bs, final_vals, col_tops = \
                    fused.fri_commit_unrolled(
                        l, l_words, l_lvl1, l_rest, l_root, fri_inv_pows,
                        schedule, eta_l, inv4_l, cfg.fri_queries, ext,
                        top_levels=self.prune_T)
                col_roots = jnp.stack(col_roots_l)
                fri_parts = [x for pair in zip(col_bs, row_bs)
                             for x in pair]
                base_words = b2.limbs_to_words(final_vals)
                if self.t_main > 0:
                    tops_parts = [
                        fused.tree_tops(m_rest, logn, self.t_main),
                        fused.tree_tops(l_rest, logn, self.t_main),
                    ] + col_tops
            else:
                col_roots, col_bundles, row_bundles, final_vals = \
                    fused.fri_commit_scan(
                        l, l_words, l_lvl1, l_rest, l_root, fri_inv_pows,
                        schedule, eta_l, inv4_l, cfg.fri_queries, ext)
                fri_parts = [col_bundles, row_bundles]
                base_words = b2.limbs_to_words(final_vals[:n_final])

            # 13. One output array PER SECTION (su.sections order): the
            # host fetches them concurrently — 8-16 parallel gets cost
            # ~RTT + bytes/110 MB/s vs ~RTT + bytes/40 MB/s for one
            # bulk buffer on the tunneled runtime (exp_r4par.json) —
            # and decodes each section as it lands.
            parts = ([m_root, l_root, main_bundle, lc_bundle, col_roots]
                     + fri_parts + [base_words] + tops_parts)
            return emit(parts)

        def post_trace_pl(trace, k_ext, zni8, h_pows, islope_l,
                          last_l, one_l, xs_big, tw_inv_small,
                          n_inv_small, tw_fwd_big, fri_inv_pows, eta_l,
                          inv4_l, inv_z2):
            # Pallas variant of post_trace_fn (round 4): all hot limb
            # math runs as VMEM-resident ops/plimbs.py kernels on
            # limb-major [16, N] arrays; trees/transcript/bundles are
            # unchanged. Bit-identical proofs (tests/test_plimbs.py).
            from .ops import plimbs
            barrier = jax.lax.optimization_barrier
            inp_l = trace[0]
            output_l = trace[-1]
            BLK = 2048

            # 2-3. LDE with Pallas butterfly stages. tw_inv_small /
            # tw_fwd_big are the PLAIN power tables here (plan.pallas).
            trace_t = jnp.transpose(trace)
            xs_t = jnp.transpose(xs_big)
            p_t = barrier(fused.lde_pl(trace_t,
                                       jnp.transpose(tw_inv_small),
                                       n_inv_small[:, None], xs_t))

            # 5-7. Constraint / quotient / boundary as ONE fused kernel.
            pr_t = jnp.roll(p_t, -ext, axis=1)
            k_tab = plimbs.tile_cols(jnp.transpose(k_ext), BLK)
            zni_tab = plimbs.tile_cols(jnp.transpose(zni8), BLK)
            slope = fl.mul(fl.sub(output_l, inp_l), islope_l)
            ia = fl.sub(inp_l, slope)
            d_t, b_t = barrier(plimbs.db_map_t(
                p_t, pr_t, xs_t, k_tab, zni_tab, jnp.transpose(inv_z2),
                last_l[:, None], slope[:, None], ia[:, None]))

            # 8. Commit #1 (96-byte P||D||B leaves).
            mleaf = jnp.transpose(jnp.concatenate(
                [fused.limbs_to_words_t(p_t),
                 fused.limbs_to_words_t(d_t),
                 fused.limbs_to_words_t(b_t)], axis=0))
            m_lvl1, m_rest, m_root = barrier(
                fused.tree_build_unrolled(mleaf))

            # 9. Fiat-Shamir weights + linear combination.
            k1 = td.challenge_limbs(m_root, 1)
            k2 = td.challenge_limbs(m_root, 2)
            k3 = td.challenge_limbs(m_root, 3)
            k4 = td.challenge_limbs(m_root, 4)
            cp_tab = plimbs.tile_cols(
                jnp.transpose(td.lincomb_coeffs(k1, k2, h_pows)), BLK)
            cb_tab = plimbs.tile_cols(
                jnp.transpose(td.lincomb_coeffs(k3, k4, h_pows)), BLK)
            l_t = barrier(plimbs.l_map_t(d_t, p_t, b_t, cp_tab, cb_tab))

            # 10. Commit #2.
            l_words = jnp.transpose(fused.limbs_to_words_t(l_t))
            l_lvl1, l_rest, l_root = barrier(
                fused.tree_build_unrolled(l_words))

            # 11. Spot checks.
            positions = td.pseudorandom_indices_dev(
                l_root, precision, cfg.spot_checks,
                exclude_multiples_of=ext)
            aug = jnp.stack([positions, (positions + ext) % precision],
                            axis=1).reshape(-1)
            main_bundle = fused.tree_bundle(mleaf, m_lvl1, m_rest, aug,
                                            logn, top_levels=self.t_main)
            lc_bundle = fused.tree_bundle(l_words, l_lvl1, l_rest,
                                          positions, logn,
                                          top_levels=self.t_main)
            main_bundle, lc_bundle = barrier((main_bundle, lc_bundle))

            # 12. FRI with the Pallas fold kernel.
            res = fused.fri_commit_unrolled_pl(
                l_t, l_words, l_lvl1, l_rest, l_root, fri_inv_pows,
                schedule, eta_l, inv4_l, cfg.fri_queries, ext,
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

            # 13. One output array per section (see post_trace_fn).
            parts = ([m_root, l_root, main_bundle, lc_bundle, col_roots]
                     + fri_parts + [base_words] + tops_parts)
            return emit(parts)

        post_fn = post_trace_pl if self.pallas else post_trace_fn

        def core_fn(inp_l, cs_tiled, k_ext, zni8, h_pows, islope_l,
                    last_l, one_l, xs_big, tw_inv_small, n_inv_small,
                    tw_fwd_big, fri_inv_pows, eta_l, inv4_l, inv_z2):
            # 1. trace (sequential scan on device, SURVEY §4.1 step 1).
            # The barrier must come BEFORE any slice: a single unfenced
            # edge out of the trace scan (e.g. output_l = trace[-1])
            # reconnects the scan to the consumer graph and retriggers
            # a pathological schedule. NOTE round-3 measurement: the
            # device scan costs ~147 us PER DEPENDENT STEP regardless of
            # unrolling (1.20 s at 2^13) — the default prover therefore
            # feeds a HOST-generated trace to `traced_core` instead; this
            # all-device form remains for environments with no host trace.
            barrier = jax.lax.optimization_barrier
            trace = barrier(fused.trace_scan(inp_l, cs_tiled))
            return post_fn(trace, k_ext, zni8, h_pows, islope_l,
                           last_l, one_l, xs_big, tw_inv_small,
                           n_inv_small, tw_fwd_big, fri_inv_pows,
                           eta_l, inv4_l, inv_z2)

        def traced_core_fn(ckpt_packed, cs_expand, k_ext, zni8, h_pows,
                           islope_l, last_l, one_l, xs_big, tw_inv_small,
                           n_inv_small, tw_fwd_big, fri_inv_pows, eta_l,
                           inv4_l, inv_z2):
            # Host-trace entry: every K-th trace state crosses H2D
            # (packed 2 u16 limbs per u32 word, [steps/K, 8]); the
            # intermediate rounds regenerate on device in parallel
            # across segments (fused.expand_trace — K dependent steps
            # instead of `steps`).
            barrier = jax.lax.optimization_barrier
            with fl.enable_lean_mul(self.plan.strided and not self.pallas):
                ckpts = fused.unpack_limbs(ckpt_packed)
                trace = barrier(fused.expand_trace(ckpts, cs_expand))
                return post_fn(trace, k_ext, zni8, h_pows,
                               islope_l, last_l, one_l, xs_big,
                               tw_inv_small, n_inv_small,
                               tw_fwd_big, fri_inv_pows, eta_l,
                               inv4_l, inv_z2)

        self._post_trace_fn = post_trace_fn
        self._traced_core_fn = traced_core_fn
        self._core_fn = core_fn
        self._core = jax.jit(core_fn)
        return self._core

    def traced_core(self):
        """Jitted proof core taking a PACKED host trace ([steps, 8]
        uint32, 2 limbs/word) instead of running the sequential MiMC
        scan on device — the round-3 headline change: the device pays
        ~147 us per dependent step (1.2 s at 2^13, 94% of prove time),
        while the native C++ trace (native/starkrt.cpp) takes ~2 ms."""
        if getattr(self, "_traced_core", None) is None:
            self.core()
            self._traced_core = jax.jit(self._traced_core_fn)
        return self._traced_core

    def batch_core(self):
        """vmap of the one-dispatch core over the INPUT axis: B proofs
        per dispatch, one [B, L] bulk transfer (config 5's single-host
        shape — DP across the batch rides the VPU lanes; SURVEY §3.2).
        All plan/config operands are broadcast (in_axes=None)."""
        if getattr(self, "_batch_core", None) is not None:
            return self._batch_core
        self.core()                      # ensure _core_fn exists
        axes = (0,) + (None,) * 15
        self._batch_core = jax.jit(jax.vmap(self._core_fn, in_axes=axes))
        return self._batch_core

    def batch_traced_core(self):
        """vmap of the host-trace core over the checkpoint axis: B
        proofs per dispatch from B host traces. The expansion-constant
        table and all plan operands broadcast."""
        if getattr(self, "_batch_traced_core", None) is not None:
            return self._batch_traced_core
        self.core()
        axes = (0,) + (None,) * 15
        self._batch_traced_core = jax.jit(
            jax.vmap(self._traced_core_fn, in_axes=axes))
        return self._batch_traced_core


def mk_mimc_proof_fused(inp: int, steps: int, round_constants,
                        config: StarkConfig = REFERENCE,
                        device_trace: bool = False):
    """One-dispatch fused prover: the whole post-trace proof is a single
    jitted graph and a single bulk device->host transfer. Transcript
    bytes identical to the staged path and the reference spec
    (tests/test_fused.py, tests/test_prover.py).

    The trace is generated on host (native C++ runtime when available)
    and fed as packed checkpoints; the device regenerates segments in
    parallel (fused.expand_trace). Measured round 3: the all-device
    sequential scan costs ~147 us per dependent step (1.20 s at 2^13 =
    94% of prove time), so `device_trace=True` exists only as the
    no-host fallback."""
    assert steps <= 2**32 // config.extension_factor
    assert is_a_power_of_2(steps) and is_a_power_of_2(len(round_constants))
    assert len(round_constants) < steps

    if not device_trace:
        import time
        t0 = time.perf_counter()
        trace = mimc_model.trace_limbs(inp, steps, round_constants)
        return _prove_from_trace_fused(np.asarray(trace), steps,
                                       round_constants, config,
                                       _trace_s=time.perf_counter() - t0)

    timer = _StageTimer(f"prove steps={steps} (fused)")
    su = _FusedSetup.get(steps, config)
    plan = su.plan

    inp_l = jnp.asarray(int_to_limbs(inp % MODULUS))
    reps = (steps - 1 + len(round_constants) - 1) // len(round_constants)
    cs_np = np.asarray(ints_to_limbs(
        [c % MODULUS for c in round_constants]))
    cs_tiled = jnp.asarray(np.tile(cs_np, (reps, 1))[:steps - 1])
    k_ext = su.k_ext_limbs(round_constants)
    timer.mark("setup")

    parts = su.core()(inp_l, cs_tiled, k_ext, su.zni8, su.h_pows,
                      su.islope_l, su.last_l, su.one_l, plan.xs_big,
                      plan.tw_inv_small, plan.n_inv_small, plan.tw_fwd_big,
                      plan.fri_inv_pows, su.eta_l, su.inv4_l, su.inv_z2)
    timer.mark("dispatch")
    pre = _fetch_prepped(parts, su)
    timer.mark("device compute + transfer")

    proof = _assemble_prepped(pre, su)
    timer.mark("proof assembly")
    LAST_PROOF_TIMINGS.clear()
    LAST_PROOF_TIMINGS.update(timer.stages)
    LAST_PROOF_TIMINGS["total"] = timer.total()
    return proof


def _trace_ckpts_packed(trace_np: np.ndarray, su: "_FusedSetup"):
    """Packed [S, 8] checkpoint upload payload from a host [steps, 16]
    limb trace: every K-th state, 2 limbs per u32 word."""
    from .ops import fused
    return fused.pack_limbs_np(trace_np[::su.trace_K])


def _prove_from_trace_fused(trace_np: np.ndarray, steps: int,
                            round_constants,
                            config: StarkConfig = REFERENCE,
                            _trace_s: float = None, _setup=None):
    """Fused one-dispatch proof from a host-computed [steps, 16] trace."""
    timer = _StageTimer(f"prove steps={steps} (fused, host trace)")
    if _trace_s is not None:
        timer.stages["host trace (native)"] = _trace_s
    su = _setup if _setup is not None else _FusedSetup.get(steps, config)
    plan = su.plan
    k_ext = su.k_ext_limbs(round_constants)
    cs_expand = su.expand_consts(round_constants)
    ckpts = jnp.asarray(_trace_ckpts_packed(trace_np, su))
    timer.mark("setup")

    parts = su.traced_core()(ckpts, cs_expand, k_ext, su.zni8,
                             su.h_pows, su.islope_l, su.last_l, su.one_l,
                             plan.xs_big, plan.tw_inv_small,
                             plan.n_inv_small, plan.tw_fwd_big,
                             plan.fri_inv_pows, su.eta_l, su.inv4_l,
                             su.inv_z2)
    timer.mark("dispatch")
    pre = _fetch_prepped(parts, su)
    timer.mark("device compute + transfer")

    proof = _assemble_prepped(pre, su)
    timer.mark("proof assembly")
    LAST_PROOF_TIMINGS.clear()
    LAST_PROOF_TIMINGS.update(timer.stages)
    LAST_PROOF_TIMINGS["total"] = timer.total()
    return proof


def mk_mimc_proof_batch_fused(inps, steps: int, round_constants,
                              config: StarkConfig = REFERENCE,
                              chunk: int = None, traces=None):
    """Batch-prove independent MiMC claims with the vmapped fused core:
    each chunk of proofs is ONE device dispatch and ONE bulk transfer.
    Proof objects are bit-identical to `mk_mimc_proof` per claim
    (tests/test_fused.py). `chunk` bounds device live memory (~0.5 GB
    per 2^16-step proof in flight); default 16.

    Traces come from the host (native runtime; pass `traces` — a list
    of [steps, 16] limb arrays — to reuse precomputed ones). Host and
    device are OVERLAPPED (SURVEY §3.2 PP): chunk i+1's trace packing +
    dispatch happen before chunk i's bulk fetch, so the device computes
    chunk i+1 while the host decodes chunk i's proofs."""
    assert is_a_power_of_2(steps) and is_a_power_of_2(len(round_constants))
    assert len(round_constants) < steps

    su = _FusedSetup.get(steps, config)
    plan = su.plan
    if chunk is None:
        chunk = 16
    k_ext = su.k_ext_limbs(round_constants)
    cs_expand = su.expand_consts(round_constants)
    core = su.batch_traced_core()

    def dispatch(part_lo):
        lo, part = part_lo
        ck = []
        for i, inp in enumerate(part):
            t = (traces[lo + i] if traces is not None else
                 mimc_model.trace_limbs(inp, steps, round_constants))
            ck.append(_trace_ckpts_packed(np.asarray(t), su))
        ckpts = jnp.asarray(np.stack(ck))
        return core(ckpts, cs_expand, k_ext, su.zni8, su.h_pows,
                    su.islope_l, su.last_l, su.one_l, plan.xs_big,
                    plan.tw_inv_small, plan.n_inv_small, plan.tw_fwd_big,
                    plan.fri_inv_pows, su.eta_l, su.inv4_l, su.inv_z2)

    chunks = [(lo, inps[lo:lo + chunk])
              for lo in range(0, len(inps), chunk)]
    proofs = []
    if not chunks:
        return proofs
    # Pipeline (round 5, from scripts/exp_batch_profile.json): fetch is
    # the dominant per-chunk cost (60-94 ms vs 26 ms decode at
    # chunk=4/2^13), so keep up to TWO chunk-fetches in flight on a
    # side executor — chunk i+1's transfer floor and streaming overlap
    # both chunk i's fetch tail and its host decode, and the device
    # queue keeps computing ahead. The fetch threads only call
    # _fetch_parts_np (which fans out to _fetch_pool); decode stays on
    # the main thread in claim order.
    import concurrent.futures as cf
    fx = cf.ThreadPoolExecutor(2)
    try:
        from collections import deque
        futs = deque()
        futs.append(fx.submit(_fetch_parts_np, dispatch(chunks[0])))
        for ci in range(len(chunks)):
            if ci + 1 < len(chunks):
                futs.append(fx.submit(_fetch_parts_np,
                                      dispatch(chunks[ci + 1])))
            parts_np = futs.popleft().result()
            for b in range(len(chunks[ci][1])):
                proofs.append(_decode_fused([p[b] for p in parts_np],
                                            su))
    finally:
        fx.shutdown(wait=True)
    return proofs


_FETCH_POOL = None


def _fetch_pool():
    global _FETCH_POOL
    if _FETCH_POOL is None:
        import concurrent.futures as cf
        _FETCH_POOL = cf.ThreadPoolExecutor(16)
    return _FETCH_POOL


def _prep_section(name, arr, main_leaf_words: int):
    """Per-section host decode (numpy array -> proof fragments). Runs
    inside the fetch worker threads so byte decode of early sections
    overlaps the network wait of later ones."""
    if name in ("m_root", "l_root"):
        return digest_words_to_bytes(arr)
    if name in ("col_bundles", "row_bundles"):
        return arr                      # scan form: sliced in assemble
    if name == "main_bundle":
        return MerkleTree.bundle_to_branches(arr, main_leaf_words)
    if name == "lc_bundle" or name.startswith(("col_b", "row_b")):
        return MerkleTree.bundle_to_branches(arr, 8)
    if name in ("col_roots", "base_words") or name.startswith("tops_"):
        return [digest_words_to_bytes(r) for r in arr]
    return arr


def _fetch_prepped(parts, su):
    """Concurrent D2H + on-arrival decode. Chunked layout
    (_FusedSetup.flat_layout): K equal flat chunks stream in parallel
    at the tunnel's aggregate rate with no straggler tail; the main
    thread waits on the chunks IN ORDER (they all run concurrently,
    so an in-order wait still sees out-of-order completions) and
    decodes each section the moment the prefix covering it has
    landed. An su without that layout (AIR setups) maps sections
    1:1 to buffers."""
    for p in parts:
        try:
            p.copy_to_host_async()
        except Exception:
            pass
    mlw = getattr(su, "main_leaf_words", 24)
    fl = getattr(su, "flat_layout", None)

    if fl is None:
        def work(i):
            name, shape = su.sections[i]
            arr = np.ascontiguousarray(jax.device_get(parts[i])
                                       ).reshape(shape)
            return name, _prep_section(name, arr, mlw)

        futs = [_fetch_pool().submit(work, i) for i in range(len(parts))]
        return dict(f.result() for f in futs)

    K, cw = su.n_chunks, su.chunk_words
    buf = np.empty(K * cw, np.uint32)

    def work_chunk(k):
        got = np.asarray(jax.device_get(parts[k])).reshape(-1)
        # Loud failure beats a silent implicit cast into the shared
        # uint32 buffer if a future core emits a different dtype.
        assert got.dtype == np.uint32, got.dtype
        buf[k * cw:(k + 1) * cw] = got

    futs = [_fetch_pool().submit(work_chunk, k) for k in range(K)]
    pre = {}
    sec_i = 0
    for j, f in enumerate(futs):
        f.result()                       # chunks 0..j now complete
        done_w = (j + 1) * cw
        while sec_i < len(fl):
            name, off, shape = fl[sec_i]
            size = 1
            for d in shape:
                size *= d
            if off + size > done_w:
                break
            # NB: scan-form sections ("col_bundles"/"row_bundles" and
            # the default branch of _prep_section) are VIEWS into
            # `buf`; safe only because buf is freshly allocated per
            # call — never pool/reuse it.
            pre[name] = _prep_section(
                name, buf[off:off + size].reshape(shape), mlw)
            sec_i += 1
    return pre


def _fetch_parts_np(parts):
    """Concurrent D2H of a tuple of device arrays -> list of np arrays
    (no decode — the batch path preps per proof row afterwards)."""
    for p in parts:
        try:
            p.copy_to_host_async()
        except Exception:
            pass
    futs = [_fetch_pool().submit(
        lambda a=a: np.ascontiguousarray(jax.device_get(a)))
        for a in parts]
    return [f.result() for f in futs]


def _complete_branches(branches, positions, tops, n_levels: int,
                       t: int):
    """Splice the pruned top-`t` sibling digests back onto each branch
    (see fused.tree_bundle top_levels / fused.tree_tops). `tops` is the
    tree's top-levels dump as a list of 32-byte digests, lowest pruned
    level's block first; the sibling of position p at level `lvl` is
    entry `(p >> lvl) ^ 1` of that level's block."""
    if t <= 0:
        return
    offs = []
    off = 0
    for lvl in range(n_levels - t, n_levels):
        offs.append(off)
        off += 1 << (n_levels - lvl)
    for b, p in zip(branches, positions):
        for k, lvl in enumerate(range(n_levels - t, n_levels)):
            b.append(tops[offs[k] + ((p >> lvl) ^ 1)])


def _complete_pruned(pre, su):
    """Host half of the pruned-bundle payload (round 4): replay the
    Fiat-Shamir positions (byte-parity with the device derivation,
    tests/test_transcript_dev.py) and splice each tree's top sibling
    levels — shipped once per tree in the tops_* sections — back onto
    the query branches. Proof objects are bit-identical to the
    unpruned layout (tests/_fused_impl.py vs the oracle)."""
    if not getattr(su, "t_main", 0):
        return
    cfg = su.config
    precision, ext, logn = su.precision, su.ext, su.logn
    positions = pseudorandom_indices(
        pre["l_root"], precision, cfg.spot_checks,
        exclude_multiples_of=ext)
    aug = []
    for p in positions:
        aug += [p, (p + ext) % precision]
    _complete_branches(pre["main_bundle"], aug, pre["tops_m"], logn,
                       su.t_main)
    _complete_branches(pre["lc_bundle"], positions, pre["tops_l"],
                       logn, su.t_main)

    row_tops = pre["tops_l"]
    from .ops import fused as _fused
    for r, (n_r, q_r) in enumerate(su.schedule):
        lognr = n_r.bit_length() - 1
        t_row = _fused.bundle_prune_depth(lognr, su.prune_T)
        t_col = su.t_cols[r]
        ys = pseudorandom_indices(pre["col_roots"][r], q_r,
                                  cfg.fri_queries,
                                  exclude_multiples_of=ext)
        row_idx = [y + q_r * j for y in ys for j in range(4)]
        _complete_branches(pre[f"row_b{r}"], row_idx, row_tops, lognr,
                           t_row)
        if t_col > 0:
            _complete_branches(pre[f"col_b{r}"], ys,
                               pre[f"tops_c{r}"], lognr - 2, t_col)
            row_tops = pre[f"tops_c{r}"]
        else:
            row_tops = None


def _assemble_prepped(pre, su):
    """Reference-shaped proof object (SURVEY §A.8) from prepped
    sections."""
    _complete_pruned(pre, su)
    fri_proof = []
    for r, (n_r, q_r) in enumerate(su.schedule):
        root_bytes = pre["col_roots"][r]
        if su.unrolled:
            col_branches = pre[f"col_b{r}"]
            row_branches = pre[f"row_b{r}"]
        else:
            w_col = 2 * 8 + 8 * (q_r.bit_length() - 1 - 1)
            w_row = 2 * 8 + 8 * (n_r.bit_length() - 1 - 1)
            col_branches = MerkleTree.bundle_to_branches(
                pre["col_bundles"][r][:, :w_col], 8)
            row_branches = MerkleTree.bundle_to_branches(
                pre["row_bundles"][r][:, :w_row], 8)
        branches = [[col_branches[i]] + row_branches[4 * i: 4 * i + 4]
                    for i in range(len(col_branches))]
        fri_proof.append([root_bytes, branches])
    fri_proof.append(pre["base_words"])
    return [pre["m_root"], pre["l_root"], pre["main_bundle"],
            pre["lc_bundle"], fri_proof]


def _decode_fused(parts_np, su: _FusedSetup):
    """Decode already-fetched per-proof numpy arrays into the
    reference-shaped proof object. With a `flat_layout` setup the
    arrays are the K equal flat uint32 chunks of the concatenated
    section stream (see _FusedSetup.flat_layout) and are re-joined
    here; without one (AIR setups) they map 1:1 to sections."""
    mlw = getattr(su, "main_leaf_words", 24)
    fl = getattr(su, "flat_layout", None)
    pre = {}
    if fl is None:
        for (name, shape), arr in zip(su.sections, parts_np):
            pre[name] = _prep_section(
                name, np.ascontiguousarray(arr).reshape(shape), mlw)
        return _assemble_prepped(pre, su)
    buf = np.concatenate(
        [np.ascontiguousarray(p).reshape(-1) for p in parts_np])
    for name, off, shape in fl:
        size = 1
        for d in shape:
            size *= d
        pre[name] = _prep_section(name, buf[off:off + size].reshape(shape),
                                  mlw)
    return _assemble_prepped(pre, su)


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
