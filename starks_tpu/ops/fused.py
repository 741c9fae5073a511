"""Single-dispatch prover building blocks: scan-structured NTT, Merkle,
and FRI that trace to SMALL XLA graphs.

Round-1 profiling on the tunneled TPU runtime showed the prover was
bound by HOST costs, not compute: ~2.3 ms per dispatch x ~200 dispatches
plus a ~25 ms floor per device->host transfer, while a fused 16-stage
NTT at 2^16 executes in 0.11 ms. This module therefore restructures
every hot stage (SURVEY.md §4.1) as `jax.lax.scan` loops with
fixed-shape bodies, so the ENTIRE post-trace proof is ONE jitted
dispatch and ONE bulk transfer:

- NTT: constant-geometry (Pease) schedules. `ntt_dif` is the
  decimation-in-frequency network (natural order in, bit-reversed out):
  every stage is u = a + b, v = (a - b) * tw over the array halves with
  outputs interleaved — identical data flow per stage, so the whole
  transform is one scan over a stacked twiddle table. `ntt_dit` is its
  transpose (bit-reversed in, natural out). Composing iNTT(DIF) ->
  zero-interleave -> NTT(DIT) gives the reference's LDE
  (`starks/fft.py` composition, SURVEY §4.4) with ZERO gather ops:
  zero-padding in the coefficient domain is a pure stride-8 reshape in
  bit-reversed layout (rev_{log 8n}(c) = 8 * rev_{log n}(c) for c < n).
- Merkle: leaf level at true shape, then one scan over levels on a
  fixed-size buffer (valid prefix halves per step; the garbage tail is
  deterministic and never read). `tree_bundle` gathers branch bundles
  on device.
- FRI: one scan over rounds on fixed [N]-shaped buffers with per-round
  static parameters passed as scanned arrays; bundles are emitted at
  the maximum width and sliced to each round's true width on host.

The math is bit-identical to the staged kernels in ops/ntt.py /
ops/merkle.py / ops/fri_fold.py (cross-tested), which remain for the
sharded multi-chip path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import blake2s as b2
from . import limbs as fl
from . import transcript_dev as td

NL = fl.NUM_LIMBS


# ---------------------------------------------------------------------------
# Twiddle plans
# ---------------------------------------------------------------------------

def _power_table_np(g: int, n: int) -> np.ndarray:
    """[n, 16] uint32 host power table g^0..g^(n-1)."""
    from ..utils import native
    table = native.power_table(g, n)
    if table is not None:
        return table.astype(np.uint32)
    vals = np.zeros((n, NL), np.uint32)
    acc = 1
    for i in range(n):
        vals[i] = np.frombuffer(acc.to_bytes(32, 'little'),
                                dtype='<u2').astype(np.uint32)
        acc = acc * g % fl.MODULUS
    return vals


def _stacked_twiddles(table: np.ndarray) -> np.ndarray:
    """TW[t][j] = table[j & ~(2^t - 1)] for the Pease DIF/DIT schedule."""
    n = table.shape[0]
    logn = n.bit_length() - 1
    j = np.arange(n // 2)
    return np.stack([table[j & ~((1 << t) - 1)] for t in range(logn)])


class FusedPlan:
    """Cached device tables for one (steps, generator) configuration."""

    _cache = {}

    # Above this domain size the stacked [logn, n/2] twiddle tables are
    # replaced by per-stage strided slices of the plain power tables
    # (ntt_*_strided): at 2^23 points the stacked form costs ~6 GB of
    # HBM vs 0 extra (the forward table IS xs_big). Measured cost at
    # 2^20: strided is ~20% slower per transform — the memory trade is
    # what makes the 2^20-steps config fit on one chip at all.
    STRIDED_THRESHOLD = 2 ** 21

    def __init__(self, steps: int, precision: int, G1: int, G2: int,
                 fri_rounds: int, pallas: bool = False):
        self.steps = steps
        self.precision = precision
        self.strided = precision >= self.STRIDED_THRESHOLD
        self.pallas = pallas
        fwd_small = _power_table_np(G1, steps)
        fwd_big = _power_table_np(G2, precision)
        inv_small = np.concatenate([fwd_small[:1], fwd_small[:0:-1]], axis=0)

        # iNTT over the trace domain (DIF, inverse twiddles) and forward
        # NTT over the evaluation domain (DIT, forward twiddles).
        # Pallas cores build per-stage twiddles from the PLAIN tables
        # (like the strided form), so no stacked tables are uploaded.
        self.xs_big = jnp.asarray(fwd_big)          # [N,16] powers of G2
        if self.strided or pallas:
            self.tw_inv_small = jnp.asarray(inv_small)
            self.tw_fwd_big = self.xs_big
        else:
            self.tw_inv_small = jnp.asarray(_stacked_twiddles(inv_small))
            self.tw_fwd_big = jnp.asarray(_stacked_twiddles(fwd_big))
        self.n_inv_small = jnp.asarray(_int_limbs(
            pow(steps, fl.MODULUS - 2, fl.MODULUS)))

        # Per-FRI-round u-tables: g_r^{-i} for g_r = G2^(4^r), i < N/4.
        inv_big = np.concatenate([fwd_big[:1], fwd_big[:0:-1]], axis=0)
        q = precision // 4
        tabs = []
        for r in range(fri_rounds):
            idx = (np.arange(q, dtype=np.int64) * (4 ** r)) % precision
            tabs.append(inv_big[idx])
        self.fri_inv_pows = jnp.asarray(np.stack(tabs))  # [R, N/4, 16]

    @classmethod
    def get(cls, steps: int, precision: int, G1: int, G2: int,
            fri_rounds: int, pallas: bool = False) -> "FusedPlan":
        key = (steps, precision, G1, G2, fri_rounds, pallas)
        if key not in cls._cache:
            cls._cache[key] = cls(steps, precision, G1, G2, fri_rounds,
                                  pallas)
        return cls._cache[key]


def _int_limbs(x: int) -> np.ndarray:
    return np.frombuffer((x % fl.MODULUS).to_bytes(32, 'little'),
                         dtype='<u2').astype(np.uint32)


# ---------------------------------------------------------------------------
# Scan-structured NTT
# ---------------------------------------------------------------------------

def ntt_dif(values, tw_stack):
    """Constant-geometry DIF: [n,16] natural order -> bit-reversed order.
    One scan over the [logn, n/2, 16] twiddle stack."""
    n = values.shape[0]

    def step(x, twt):
        a, b = x[:n // 2], x[n // 2:]
        u = fl.add(a, b)
        v = fl.mul(fl.sub(a, b), twt)
        return jnp.stack([u, v], axis=1).reshape(n, NL), None

    x, _ = jax.lax.scan(step, values, tw_stack)
    return x


def ntt_dit(values, tw_stack):
    """Transpose network: [n,16] bit-reversed order -> natural order.
    Applies the DIF stages' transposes in reverse twiddle order."""
    n = values.shape[0]

    def step(x, twt):
        pairs = x.reshape(n // 2, 2, NL)
        a, b = pairs[:, 0], pairs[:, 1]
        wv = fl.mul(twt, b)
        return jnp.concatenate([fl.add(a, wv), fl.sub(a, wv)], axis=0), None

    x, _ = jax.lax.scan(step, values, tw_stack[::-1])
    return x


def lde_fused(trace, tw_inv_small, n_inv_small, tw_fwd_big):
    """Low-degree extension, gather-free: iNTT (DIF, bitrev out) ->
    stride-8 zero interleave (= zero-pad in the coefficient domain,
    reindexed to the big domain's bit-reversed layout: for c < n,
    rev_{log 8n}(c) = 8 * rev_{log n}(c)) -> forward NTT (DIT, natural
    out). Matches `fft(fft(trace, G1, inv=True), G2)` bit-for-bit
    (tests/test_fused.py)."""
    steps = trace.shape[0]
    precision = 2 * tw_fwd_big.shape[1]
    ext = precision // steps
    coeffs_brev = ntt_dif(trace, tw_inv_small)
    coeffs_brev = fl.mul(coeffs_brev, n_inv_small[None])
    padded = jnp.zeros((steps, ext, NL), jnp.uint32)
    padded = padded.at[:, 0, :].set(coeffs_brev)
    return ntt_dit(padded.reshape(precision, NL), tw_fwd_big)


def _stage_twiddles(table, t: int, half: int):
    """Stage-t Pease twiddles TW[j] = table[(j >> t) << t], j < half,
    built from the FULL power table by a static strided slice +
    broadcast — no [logn, n/2] stacked table. At the 2^23-point domain
    the stacked table costs ~6 GB of HBM; this form keeps only the
    [n, 16] power table (which the prover already holds as xs_big)."""
    stride = 1 << t
    sub = table[::stride][: half >> t] if t else table[:half]
    return jnp.broadcast_to(sub[:, None], (half >> t, stride, NL)
                            ).reshape(half, NL)


def ntt_dif_strided(values, table):
    """Constant-geometry DIF with per-stage strided twiddles (static
    stage loop; same math/bits as ntt_dif over _stacked_twiddles(table),
    cross-tested). [n,16] natural order -> bit-reversed order."""
    n = values.shape[0]
    logn = n.bit_length() - 1
    x = values
    for t in range(logn):
        tw = _stage_twiddles(table, t, n // 2)
        a, b = x[:n // 2], x[n // 2:]
        u = fl.add(a, b)
        v = fl.mul(fl.sub(a, b), tw)
        x = jnp.stack([u, v], axis=1).reshape(n, NL)
    return x


def ntt_dit_strided(values, table):
    """Transpose network with strided twiddles: bit-reversed -> natural
    order (matches ntt_dit over _stacked_twiddles(table))."""
    n = values.shape[0]
    logn = n.bit_length() - 1
    x = values
    for t in range(logn - 1, -1, -1):
        tw = _stage_twiddles(table, t, n // 2)
        pairs = x.reshape(n // 2, 2, NL)
        a, b = pairs[:, 0], pairs[:, 1]
        wv = fl.mul(tw, b)
        x = jnp.concatenate([fl.add(a, wv), fl.sub(a, wv)], axis=0)
    return x


def lde_strided(trace, inv_small_table, n_inv_small, fwd_big_table):
    """lde_fused with strided-twiddle NTTs (memory-lean: needs only the
    two power tables, one of which is the prover's xs_big)."""
    steps = trace.shape[0]
    precision = fwd_big_table.shape[0]
    ext = precision // steps
    coeffs_brev = ntt_dif_strided(trace, inv_small_table)
    coeffs_brev = fl.mul(coeffs_brev, n_inv_small[None])
    padded = jnp.zeros((steps, ext, NL), jnp.uint32)
    padded = padded.at[:, 0, :].set(coeffs_brev)
    return ntt_dit_strided(padded.reshape(precision, NL), fwd_big_table)


# ---------------------------------------------------------------------------
# Pallas limb-major NTT / LDE (round 4: ops/plimbs.py kernels in the
# prover hot path). Data flows limb-major [16, n] between stages; the
# per-stage twiddles are built from the PLAIN power tables (the strided
# construction — no [logn, n/2] stacked tables at any size), because
# with VMEM-resident butterfly kernels the twiddle broadcast is a minor
# cost while the stacked table is ~6 GB at the 2^23-point domain.
# Bit-identical to ntt_dif/ntt_dit over _stacked_twiddles (cross-tested
# in tests/test_plimbs.py).
# ---------------------------------------------------------------------------

def limbs_to_words_t(x_t):
    """[16, n] limb-major field elements -> [8, n] big-endian message
    word rows (= b2.limbs_to_words on the transpose)."""
    rev = x_t[::-1, :]
    hi16 = rev[0::2, :]
    lo16 = rev[1::2, :]
    bs_hi = ((hi16 & 0xFF) << 8) | (hi16 >> 8)
    bs_lo = ((lo16 & 0xFF) << 8) | (lo16 >> 8)
    return bs_hi | (bs_lo << 16)


def _stage_tw_t(table_t, t: int, half: int):
    """Limb-major stage-t Pease twiddles TW[:, j] = table[:, (j>>t)<<t]
    for j < half (the _stage_twiddles construction, transposed)."""
    stride = 1 << t
    sub = table_t[:, ::stride][:, : half >> t] if t else table_t[:, :half]
    return jnp.broadcast_to(sub[:, :, None], (NL, half >> t, stride)
                            ).reshape(NL, half)


def ntt_dif_pl(x_t, table_t):
    """Constant-geometry DIF over [16, n] with Pallas butterfly stages:
    natural order in -> bit-reversed out (same bits as ntt_dif)."""
    from . import plimbs
    n = x_t.shape[1]
    logn = n.bit_length() - 1
    for t in range(logn):
        u, v = plimbs.dif_stage_x(x_t, _stage_tw_t(table_t, t, n // 2))
        x_t = jnp.stack([u, v], axis=2).reshape(NL, n)
    return x_t


def ntt_dit_pl(x_t, table_t):
    """Transpose network over [16, n]: bit-reversed in -> natural out
    (same bits as ntt_dit)."""
    from . import plimbs
    n = x_t.shape[1]
    logn = n.bit_length() - 1
    for t in range(logn - 1, -1, -1):
        x4 = x_t.reshape(NL, n // 2, 2)
        u, v = plimbs.dit_stage_t(x4[:, :, 0], x4[:, :, 1],
                                  _stage_tw_t(table_t, t, n // 2))
        x_t = jnp.concatenate([u, v], axis=1)
    return x_t


def lde_pl(trace_t, inv_small_t, n_inv_s, fwd_big_t):
    """lde_fused on limb-major operands with Pallas stages. trace_t:
    [16, steps]; inv_small_t/fwd_big_t: PLAIN power tables [16, steps] /
    [16, precision]; n_inv_s: [16, 1]."""
    from . import plimbs
    steps = trace_t.shape[1]
    precision = fwd_big_t.shape[1]
    ext = precision // steps
    coeffs = ntt_dif_pl(trace_t, inv_small_t)
    coeffs = plimbs.scale_t(coeffs, n_inv_s)
    padded = jnp.zeros((NL, steps, ext), jnp.uint32)
    padded = padded.at[:, :, 0].set(coeffs).reshape(NL, precision)
    return ntt_dit_pl(padded, fwd_big_t)


def fri_commit_unrolled_pl(l_t, l_words, l_lvl1, l_rest, l_root,
                           fri_inv_pows, schedule, eta_l, inv4_l,
                           queries: int, exclude: int,
                           top_levels: int = 0):
    """fri_commit_unrolled with the fold as the Pallas fold4 kernel and
    values kept limb-major. Emits identical sections (true per-round
    widths); bit-identical bytes (tests/test_plimbs.py)."""
    from . import plimbs
    values_t, tleaf, tlvl1, trest, troot = (l_t, l_words, l_lvl1,
                                            l_rest, l_root)
    col_roots, col_bundles, row_bundles, col_tops = [], [], [], []
    barrier = jax.lax.optimization_barrier
    eta_s = eta_l[:, None]
    inv4_s = inv4_l[:, None]
    for r, (n_r, q_r) in enumerate(schedule):
        lognr = n_r.bit_length() - 1
        t_row = bundle_prune_depth(lognr, top_levels)
        t_col = bundle_prune_depth(lognr - 2, top_levels)
        sx = td.special_x_limbs(troot)
        ip_t = jnp.transpose(fri_inv_pows[r][:q_r])
        column_t = barrier(plimbs.fold4_t(values_t, ip_t, sx[:, None],
                                          eta_s, inv4_s))

        col_words = jnp.transpose(limbs_to_words_t(column_t))
        c_lvl1, c_levels, c_root = barrier(tree_build_unrolled(col_words))
        ys = pseudorandom_indices_traced(c_root, q_r, queries,
                                         exclude_multiples_of=exclude)
        col_bundles.append(tree_bundle(col_words, c_lvl1, c_levels, ys,
                                       lognr - 2, top_levels=t_col))
        row_idx = (ys[:, None]
                   + q_r * jnp.arange(4, dtype=jnp.int32)[None]
                   ).reshape(-1)
        row_bundles.append(tree_bundle(tleaf, tlvl1, trest, row_idx,
                                       lognr, top_levels=t_row))
        col_roots.append(c_root)
        if t_col > 0:
            col_tops.append(tree_tops(c_levels, lognr - 2, t_col))

        values_t, tleaf, tlvl1, trest, troot = (
            column_t, col_words, c_lvl1, c_levels, c_root)
    if top_levels > 0:
        return col_roots, col_bundles, row_bundles, values_t, col_tops
    return col_roots, col_bundles, row_bundles, values_t


# ---------------------------------------------------------------------------
# Scan-structured Merkle tree
# ---------------------------------------------------------------------------

def _tree_hasher():
    """Pick the blake2s formulation for Merkle levels by backend.

    The transposed (structure-of-arrays) kernel `blake2s_words_t` fully
    utilizes VPU lanes on TPU, but it emits ~3x the HLO instructions of
    the SIMD-row form, and XLA:CPU's compile time on the nested
    tree/FRI scans explodes with it (observed: >30 min vs ~4 min for
    the fused core at steps=64). TPU compiles are served remotely and
    tolerate it. Both forms are digest-identical (tests/test_ops.py)."""
    import jax
    if jax.default_backend() == "cpu":
        return b2.blake2s_words
    return b2.blake2s_words_t


def tree_build(leaf_words):
    """Device Merkle tree as (lvl1, rest, root_words).

    leaf_words: [M, W] uint32 words (W=8 for 32-byte leaves, 24 for the
    96-byte P||D||B main-tree leaves; leaves unhashed per SURVEY §A.4).
    lvl1: [M/2, 8] parent digests of leaf pairs (true shape).
    rest: [log2(M)-1, M/4, 8] — rest[k] holds level k+2 in its first
    M/2^(k+2) entries (the tail is deterministic garbage: hashes of
    stale data, never read).
    root_words: [8] = rest[-1][0].
    """
    m, w = leaf_words.shape
    hasher = _tree_hasher()
    lvl1 = hasher(leaf_words.reshape(m // 2, 2 * w), 2 * w * 4)
    logm = m.bit_length() - 1

    def step(cur, _):
        digs = hasher(cur.reshape(m // 4, 16), 64)
        nxt = jnp.concatenate([digs, digs], axis=0)
        return nxt, digs

    # Dummy xs: xs-driven scans compile fast on this backend, while
    # length-only loops lower through the pathological while-loop path.
    dummy = jnp.zeros((logm - 1, 1), jnp.uint32)
    _, rest = jax.lax.scan(step, lvl1, dummy)
    return lvl1, rest, rest[logm - 2][0]


def tree_bundle(leaf_words, lvl1, rest, idx, n_levels: int,
                top_levels: int = 0):
    """[K, 2W + 8*(n_levels-1-top_levels)] branch bundles (leaf,
    sibling leaf, digest sibling per level bottom-up, root omitted)
    gathered on device; decode with MerkleTree.bundle_to_branches.
    `n_levels` is static (= log2 of the VALID tree size; for padded
    buffers pass the max and slice on host).

    `top_levels` > 0 OMITS the top `top_levels` sibling entries — the
    branches' top siblings repeat across queries, so the prover ships
    the tree's top levels ONCE (`tree_tops`) and the host splices them
    back by replaying the Fiat-Shamir positions (round 4: cuts the
    query-bundle D2H payload ~40% on the ~37 MB/s tunnel)."""
    assert 0 <= top_levels <= max(n_levels - 2, 0)
    idx = jnp.asarray(idx, jnp.int32)
    parts = [jnp.take(leaf_words, idx, axis=0),
             jnp.take(leaf_words, idx ^ 1, axis=0)]
    node = idx >> 1
    if n_levels >= 2:
        parts.append(jnp.take(lvl1, node ^ 1, axis=0))
        node = node >> 1
    for k in range(n_levels - 2 - top_levels):
        parts.append(jnp.take(rest[k], node ^ 1, axis=0))
        node = node >> 1
    return jnp.concatenate(parts, axis=-1)


def tree_tops(rest, n_levels: int, top_levels: int):
    """[2^(top_levels+1) - 2, 8] — ALL nodes of the top `top_levels`
    levels below the root, lowest level first (level n_levels-top_levels
    block of 2^top_levels nodes, then upward to level n_levels-1's 2
    nodes). Complements tree_bundle(top_levels=...); the host splices
    branch siblings out of this with (pos >> level) ^ 1 indexing
    (prover._complete_branches). `rest` is the unrolled-form level list
    (rest[k] = level k+2 nodes)."""
    assert 1 <= top_levels <= n_levels - 2
    return jnp.concatenate(
        [rest[lvl - 2] for lvl in range(n_levels - top_levels, n_levels)],
        axis=0)


def bundle_prune_depth(n_levels: int, cap: int = 7) -> int:
    """Top-levels prune depth for a depth-`n_levels` tree: at most
    `cap` (break-even vs shipping 2^(t+1) tops nodes at ~40-200
    branches/tree), clipped so at least the two leaf entries and one
    digest sibling stay in-bundle."""
    return max(0, min(cap, n_levels - 2))


# ---------------------------------------------------------------------------
# Traced-modulus Fiat-Shamir indices (for the FRI round scan)
# ---------------------------------------------------------------------------

def pseudorandom_indices_traced(root_words, modulus, count: int,
                                exclude_multiples_of: int = 0):
    """`transcript.pseudorandom_indices` with a TRACED modulus (the FRI
    round scan's domain size shrinks per iteration). modulus must be a
    multiple of exclude_multiples_of (true for all FRI rounds: sizes are
    powers of two >= 4*cutoff). Returns int32 [count]."""
    n_digests = (4 * count + 31) // 32
    chunks = [root_words]
    last = root_words
    for _ in range(n_digests - 1):
        pad = jnp.zeros(last.shape[:-1] + (8,), jnp.uint32)
        last = b2.blake2s_words(jnp.concatenate([last, pad], axis=-1), 32)
        chunks.append(last)
    words = jnp.concatenate(chunks, axis=-1)[..., :count]
    be = td._byteswap32(words)
    m = jnp.asarray(modulus, jnp.uint32)
    if exclude_multiples_of == 0:
        return (be % m).astype(jnp.int32)
    ex = exclude_multiples_of
    real_modulus = (m // jnp.uint32(ex)) * jnp.uint32(ex - 1)
    o = be % real_modulus
    return (o + 1 + o // jnp.uint32(ex - 1)).astype(jnp.int32)


# ---------------------------------------------------------------------------
# FRI: one scan over rounds
# ---------------------------------------------------------------------------

def fri_round_schedule(precision: int, maxdeg_plus_1: int, cutoff: int):
    """Static per-round sizes: [(n_r, q_r), ...] while maxdeg+1 > cutoff."""
    out = []
    n = precision
    while maxdeg_plus_1 > cutoff:
        out.append((n, n // 4))
        n //= 4
        maxdeg_plus_1 //= 4
    return out


def fri_commit_scan(l_evals, l_words, l_lvl1, l_rest, l_root,
                    fri_inv_pows, schedule, eta_limbs, inv4_limbs,
                    queries: int, exclude: int):
    """FRI commit + query phases as ONE scan over rounds.

    Carry: (values [N,16], tree leaf words [N,8], lvl1 [N/2,8],
    rest [L1, N/4, 8], root [8]) — round 0's tree IS the L-tree (the
    reference merkelizes L again inside FRI; same bytes, SURVEY §4.3).
    Emits per round: column root [8], column bundle [q, Wc_max], row
    bundle [4q, Wr_max] — sliced to true widths on host.

    Returns (col_roots [R,8], col_bundles, row_bundles, final_values).
    """
    n = l_evals.shape[0]
    nq = n // 4
    logn = n.bit_length() - 1
    L1 = logn - 1                      # rest levels in the [N] tree
    rounds = len(schedule)

    qs = jnp.asarray([q for (_, q) in schedule], jnp.int32)
    # root of the column tree lives at level log2(q) of the [N/4]-buffer
    # tree; rest index = log2(q) - 2.
    root_idx = jnp.asarray([q.bit_length() - 1 - 2 for (_, q) in schedule],
                           jnp.int32)

    leaf_pad = jnp.zeros((n - nq, 8), jnp.uint32)
    lvl1_pad = jnp.zeros((n // 2 - n // 8, 8), jnp.uint32)

    def body(carry, xs):
        values, tleaf, tlvl1, trest, troot = carry
        q, ridx, inv_pows_r = xs

        # --- fold at special_x = int(root) mod p (SURVEY §4.3) --------
        sx = td.special_x_limbs(troot)
        rows = [jax.lax.dynamic_slice(values, (j * q, 0), (nq, NL))
                for j in range(4)]
        y0, y1, y2, y3 = rows
        e0 = fl.add(y0, y2)
        d02 = fl.sub(y0, y2)
        e1 = fl.add(y1, y3)
        d13 = fl.sub(y1, y3)
        a0 = fl.add(e0, e1)
        a2 = fl.sub(e0, e1)
        h = fl.mul(d13, eta_limbs[None])
        a1 = fl.sub(d02, h)
        a3 = fl.add(d02, h)
        u = fl.mul(jnp.broadcast_to(sx[None], (nq, NL)), inv_pows_r)
        horner = fl.add(fl.mul(u, a3), a2)
        horner = fl.add(fl.mul(u, horner), a1)
        horner = fl.add(fl.mul(u, horner), a0)
        column = fl.mul(horner, inv4_limbs[None])          # [N/4,16]
        # Fence the fold from the tree build (see prover._FusedSetup:
        # unfenced scan-into-scan graphs schedule pathologically).
        column = jax.lax.optimization_barrier(column)

        # --- column tree + Fiat-Shamir queries ------------------------
        col_words = b2.limbs_to_words(column)              # [N/4,8]
        c_lvl1, c_rest, _ = jax.lax.optimization_barrier(
            tree_build(col_words))
        col_root = jax.lax.dynamic_index_in_dim(
            c_rest, ridx, keepdims=False)[0]
        ys = pseudorandom_indices_traced(col_root, q, queries,
                                         exclude_multiples_of=exclude)

        col_bundle = tree_bundle(col_words, c_lvl1, c_rest, ys, logn - 2)
        row_idx = (ys[:, None]
                   + q * jnp.arange(4, dtype=jnp.int32)[None]).reshape(-1)
        row_bundle = tree_bundle(tleaf, tlvl1, trest, row_idx, logn)

        # --- next round's state: column becomes values + row tree -----
        new_values = jnp.concatenate(
            [column, jnp.zeros((n - nq, NL), jnp.uint32)], axis=0)
        new_tleaf = jnp.concatenate([col_words, leaf_pad], axis=0)
        new_tlvl1 = jnp.concatenate([c_lvl1, lvl1_pad], axis=0)
        pad_rows = jnp.zeros((c_rest.shape[0], n // 4 - n // 16, 8),
                             jnp.uint32)
        new_rest = jnp.concatenate([c_rest, pad_rows], axis=1)
        pad_lvls = jnp.zeros((L1 - new_rest.shape[0], n // 4, 8),
                             jnp.uint32)
        new_rest = jnp.concatenate([new_rest, pad_lvls], axis=0)

        new_carry = (new_values, new_tleaf, new_tlvl1, new_rest, col_root)
        return new_carry, (col_root, col_bundle, row_bundle)

    init = (l_evals, l_words, l_lvl1, l_rest, l_root)
    xs = (qs, root_idx, fri_inv_pows[:rounds])
    carry, (col_roots, col_bundles, row_bundles) = jax.lax.scan(
        body, init, xs)
    final_values = carry[0]
    return col_roots, col_bundles, row_bundles, final_values


def tree_build_unrolled(leaf_words):
    """Merkle tree with statically-unrolled levels at TRUE shapes.

    Same math/bytes as `tree_build` (cross-tested), but each level is
    its own array of exact size — no [M/4]-padded scan buffer (1.4 GB
    at the 2^23-point domain vs ~134 MB here) and no per-level scan
    iteration overhead. Compile cost grows with log M, so the CPU test
    backend keeps the scan form (prover gates on backend/size).
    Returns (lvl1 [M/2, 8], levels list of [M/2^k, 8] for k >= 2, root).
    """
    m, w = leaf_words.shape
    hasher = _tree_hasher()
    lvl1 = hasher(leaf_words.reshape(m // 2, 2 * w), 2 * w * 4)
    levels = []
    cur = lvl1
    while cur.shape[0] > 1:
        cur = hasher(cur.reshape(cur.shape[0] // 2, 16), 64)
        levels.append(cur)
    root = levels[-1][0] if levels else lvl1[0]
    return lvl1, levels, root


def fri_commit_unrolled(l_evals, l_words, l_lvl1, l_rest, l_root,
                        fri_inv_pows, schedule, eta_limbs, inv4_limbs,
                        queries: int, exclude: int, top_levels: int = 0):
    """FRI commit + query phases, statically UNROLLED over rounds.

    Round-3 replacement for `fri_commit_scan` on the TPU path: with
    <= ~10 rounds the unrolled graph is still ONE dispatch, but every
    round works at its TRUE shape — no [N]-padded scan carries (the
    padded form costs ~4.6 GB of HBM at the 2^23-point domain) and the
    emitted bundles carry true per-round widths (the padded form wastes
    ~25% of the proof's D2H bytes on the ~14-25 MB/s tunnel).

    The fold constant eta = g_r^(n_r/4) = G2^(N/4) is round-independent
    (g_r = G2^(4^r), n_r = N/4^r). `l_rest` may be the scan-form padded
    array or a list of true-shape levels.
    Returns (col_roots list[R] of [8], col_bundles list[R] of [q, w_c],
    row_bundles list[R] of [4q, w_r], final_values [n_final, 16]) —
    plus, when `top_levels` > 0, a list of per-round column-tree tops
    (tree_tops; the round-r ROW tree is the round-(r-1) column tree —
    or the caller's L tree for r=0 — so no separate row tops exist).
    """
    values, tleaf, tlvl1, trest, troot = (l_evals, l_words, l_lvl1,
                                          l_rest, l_root)
    col_roots, col_bundles, row_bundles, col_tops = [], [], [], []
    barrier = jax.lax.optimization_barrier
    for r, (n_r, q_r) in enumerate(schedule):
        lognr = n_r.bit_length() - 1
        t_row = bundle_prune_depth(lognr, top_levels)
        t_col = bundle_prune_depth(lognr - 2, top_levels)
        sx = td.special_x_limbs(troot)
        y0 = values[0 * q_r:1 * q_r]
        y1 = values[1 * q_r:2 * q_r]
        y2 = values[2 * q_r:3 * q_r]
        y3 = values[3 * q_r:4 * q_r]
        e0 = fl.add(y0, y2)
        d02 = fl.sub(y0, y2)
        e1 = fl.add(y1, y3)
        d13 = fl.sub(y1, y3)
        a0 = fl.add(e0, e1)
        a2 = fl.sub(e0, e1)
        h = fl.mul(d13, eta_limbs[None])
        a1 = fl.sub(d02, h)
        a3 = fl.add(d02, h)
        u = fl.mul(jnp.broadcast_to(sx[None], (q_r, NL)),
                   fri_inv_pows[r][:q_r])
        horner = fl.add(fl.mul(u, a3), a2)
        horner = fl.add(fl.mul(u, horner), a1)
        horner = fl.add(fl.mul(u, horner), a0)
        column = barrier(fl.mul(horner, inv4_limbs[None]))   # [n_r/4,16]

        col_words = b2.limbs_to_words(column)
        c_lvl1, c_levels, c_root = barrier(tree_build_unrolled(col_words))
        ys = pseudorandom_indices_traced(c_root, q_r, queries,
                                         exclude_multiples_of=exclude)
        col_bundles.append(tree_bundle(col_words, c_lvl1, c_levels, ys,
                                       lognr - 2, top_levels=t_col))
        row_idx = (ys[:, None]
                   + q_r * jnp.arange(4, dtype=jnp.int32)[None]
                   ).reshape(-1)
        row_bundles.append(tree_bundle(tleaf, tlvl1, trest, row_idx,
                                       lognr, top_levels=t_row))
        col_roots.append(c_root)
        if t_col > 0:
            col_tops.append(tree_tops(c_levels, lognr - 2, t_col))

        values, tleaf, tlvl1, trest, troot = (column, col_words, c_lvl1,
                                              c_levels, c_root)
    if top_levels > 0:
        return col_roots, col_bundles, row_bundles, values, col_tops
    return col_roots, col_bundles, row_bundles, values


# ---------------------------------------------------------------------------
# Batch inversion / inverse with scan-only control flow
# ---------------------------------------------------------------------------

def inv_scan(x):
    """Fermat inverse x^(p-2) with the square-and-multiply loop as a
    scan over a static bit table (fori_loop compiles pathologically on
    the tunneled backend; scan does not). inv(0) = 0."""
    e = fl.MODULUS - 2
    bits = jnp.asarray([(e >> i) & 1 for i in range(e.bit_length())][::-1],
                       jnp.uint32)
    one = jnp.zeros_like(x).at[..., 0].set(1)

    def step(acc, bit):
        acc = fl.mul(acc, acc)
        return jnp.where(bit == 1, fl.mul(acc, x), acc), None

    out, _ = jax.lax.scan(step, one, bits)
    return out


def batch_inv_scan(v, rows: int = None):
    """`multi_inv` (SURVEY §3.1): ONE Fermat inversion + prefix/suffix
    products, blocked [R, C] so the scans vectorize across rows. Same
    math as limbs.batch_inv but with the final inversion scan-only."""
    n = v.shape[0]
    if rows is None:
        rows = 1
        while rows * rows < n and rows < 4096:
            rows *= 2
        while n % rows:
            rows //= 2
    cols = n // rows

    is_zero = jnp.all(v == 0, axis=-1, keepdims=True)
    one = jnp.zeros_like(v).at[..., 0].set(1)
    v1 = jnp.where(is_zero, one, v)

    vr = jnp.moveaxis(v1.reshape(rows, cols, NL), 1, 0)  # [C, R, 16]
    one_row = jnp.zeros((rows, NL), jnp.uint32).at[..., 0].set(1)

    def scan_excl(carry, x):
        return fl.mul(carry, x), carry

    row_total, pre_excl = jax.lax.scan(scan_excl, one_row, vr)
    _, suf_excl_r = jax.lax.scan(scan_excl, one_row, vr[::-1])
    suf_excl = suf_excl_r[::-1]

    one1 = jnp.zeros((NL,), jnp.uint32).at[0].set(1)
    total, row_pre_excl = jax.lax.scan(scan_excl, one1, row_total)
    _, row_suf_excl_r = jax.lax.scan(scan_excl, one1, row_total[::-1])
    row_suf_excl = row_suf_excl_r[::-1]

    total_inv = inv_scan(total)

    before = fl.mul(row_pre_excl[None], pre_excl)
    after = fl.mul(row_suf_excl[None], suf_excl)
    out = fl.mul(fl.mul(before, after), total_inv[None, None])
    out = jnp.moveaxis(out, 0, 1).reshape(n, NL)
    return jnp.where(is_zero, jnp.zeros_like(out), out)


# ---------------------------------------------------------------------------
# Packed limb transport (halves H2D bytes for host-generated traces)
# ---------------------------------------------------------------------------

def pack_limbs_np(limbs: np.ndarray) -> np.ndarray:
    """[..., 16] u32 (u16 limbs) -> [..., 8] u32, 2 limbs per word
    (limb 2j in the low half, 2j+1 in the high half)."""
    return (limbs[..., 0::2] | (limbs[..., 1::2] << 16)).astype(np.uint32)


def unpack_limbs(packed):
    """Device-side inverse of pack_limbs_np: [..., 8] -> [..., 16]."""
    lo = packed & jnp.uint32(0xFFFF)
    hi = packed >> 16
    return jnp.stack([lo, hi], axis=-1).reshape(packed.shape[:-1] + (16,))


# ---------------------------------------------------------------------------
# MiMC trace on device
# ---------------------------------------------------------------------------

def trace_scan(inp_limbs, constants_tiled):
    """[steps,16] MiMC trace from a [steps-1,16] tiled constant table:
    x_{i+1} = x_i^3 + c_i (SURVEY §4.1 step 1).

    MEASURED (round 3, fetch-forced): ~147 us PER DEPENDENT STEP on the
    v5e (1.20 s at 2^13), independent of scan unroll — the cost is
    dependent-chain latency, not loop machinery. Kept only as the
    no-host-trace fallback; the default prover uses `expand_trace` over
    host-computed checkpoints (K dependent steps instead of `steps`)."""
    def step(x, c):
        nx = fl.add(fl.cube(x), c)
        return nx, nx

    _, ys = jax.lax.scan(step, inp_limbs, constants_tiled)
    return jnp.concatenate([inp_limbs[None], ys], axis=0)


def expand_trace(ckpts, consts_ks):
    """Parallel MiMC trace expansion from checkpoints.

    The trace recurrence is sequential, but only along each SEGMENT:
    given every K-th state (host-computed by the native runtime,
    native/starkrt.cpp :: starkrt_mimc_trace), the device regenerates
    all segments simultaneously — K dependent rounds at full VPU width
    instead of `steps` dependent rounds at width 16. With the measured
    ~150 us/dependent-step latency floor this turns the 1.20 s device
    trace at 2^13 into ~K*0.15 ms, and shrinks the H2D upload from
    steps*32 B to (steps/K)*32 B (the tunnel moves ~25 MB/s).

    ckpts: [S, 16] segment-start states (trace[s*K]).
    consts_ks: [K, S, 16] with consts_ks[j, s] = c[(s*K + j) % n_c].
    Returns [S*K, 16]: row s*K+j = trace state s*K+j.
    """
    def step(x, c):
        nx = fl.add(fl.cube(x), c)
        return nx, x

    _, ys = jax.lax.scan(step, ckpts, consts_ks)     # [K, S, 16]
    return jnp.moveaxis(ys, 0, 1).reshape(-1, NL)
