"""Pallas 256-bit field kernels, limb-major layout (round-3 proven).

The XLA limb kernels (ops/limbs.py) are HBM-bandwidth-bound: XLA
materializes most of the ~80 intermediate arrays of the schoolbook
mul+fold per call. These Pallas kernels keep the whole computation in
VMEM — one read of each operand block, one write of the result.

MEASURED on the v5e (scripts/exp_pmul.py / exp_pntt.py, K-chained,
floor-subtracted, digest-exact vs ops/limbs.py):

  - modmul:              3.09e9 modmul/s at 2^20   (70x fl.mul)
  - full DIF butterfly:  0.21 ms per 2^20-point stage (~4 ms/20-stage
                         NTT vs 180 ms for the XLA scan form)
  - [N,16] <-> [16,N] boundary transpose: free (below timing noise)

Layout: limb-major [16, N] uint32 (each limb row is a clean
[8, 128]-tileable vector). `to_limb_major` / `from_limb_major` convert
at the boundary. Kernels are exercised by tests/test_plimbs.py (Pallas
interpret mode on CPU; compiled on TPU). Prover integration is the
round-4 path to >100x (BASELINE.md "Proven next step").
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

from . import limbs as fl

NL = 16
_MASK = np.uint32(0xFFFF)
_C0, _C1, _C2 = [np.uint32(x) for x in fl._C3]
_P = [np.uint32(x) for x in fl.P_LIMBS]


def to_limb_major(x):
    """[N, 16] -> [16, N]."""
    return jnp.transpose(x)


def from_limb_major(x):
    """[16, N] -> [N, 16]."""
    return jnp.transpose(x)


def _propagate(cs, zero):
    out = []
    carry = zero
    for c in cs:
        t = c + carry
        out.append(t & _MASK)
        carry = t >> 16
    return out, carry


def _cond_sub_p(g, zero):
    borrow = zero
    d = []
    for i in range(NL):
        t = g[i] + _MASK + np.uint32(1) - _P[i] - borrow
        d.append(t & _MASK)
        borrow = np.uint32(1) - (t >> 16)
    ge = borrow == 0
    return [jnp.where(ge, d[i], g[i]) for i in range(NL)]


def _mul_lanes(a, b, zero):
    """Canonical modular product of two 16-lane-vector limb lists."""
    cols = [zero] * 32
    for i in range(NL):
        for j in range(NL):
            p = a[i] * b[j]
            cols[i + j] = cols[i + j] + (p & _MASK)
            cols[i + j + 1] = cols[i + j + 1] + (p >> 16)
    w, _ = _propagate(cols, zero)

    # fold 1: lo + hi*c (c = 351*2^32 - 1, 3 limbs), 20 columns
    f = [zero] * 20
    for i in range(NL):
        f[i] = w[i]
    for i in range(NL):
        h = w[NL + i]
        for k, cc in enumerate((_C0, _C1, _C2)):
            p = cc * h
            f[i + k] = f[i + k] + (p & _MASK)
            f[i + k + 1] = f[i + k + 1] + (p >> 16)
    f, _ = _propagate(f, zero)

    # fold 2: 16+4 -> 16 limbs, then final tiny carry fold
    g = [f[i] for i in range(NL)]
    for i in range(4):
        h = f[NL + i]
        for k, cc in enumerate((_C0, _C1, _C2)):
            p = cc * h
            g[i + k] = g[i + k] + (p & _MASK)
            g[i + k + 1] = g[i + k + 1] + (p >> 16)
    g, carry = _propagate(g, zero)
    g[0] = g[0] + carry * _C0
    g[1] = g[1] + carry * _C1
    g[2] = g[2] + carry * _C2
    g, _ = _propagate(g, zero)
    return _cond_sub_p(g, zero)


def _add_lanes(a, b, zero):
    out, carry = _propagate([a[i] + b[i] for i in range(NL)], zero)
    out[0] = out[0] + carry * _C0
    out[1] = out[1] + carry * _C1
    out[2] = out[2] + carry * _C2
    out, _ = _propagate(out, zero)
    return _cond_sub_p(out, zero)


def _sub_lanes(a, b, zero):
    borrow = zero
    d = []
    for i in range(NL):
        t = a[i] + _MASK + np.uint32(1) - b[i] - borrow
        d.append(t & _MASK)
        borrow = np.uint32(1) - (t >> 16)
    ge = borrow == 0
    borrow2 = zero
    d2 = []
    cl = (_C0, _C1, _C2)
    for i in range(NL):
        ci = cl[i] if i < 3 else np.uint32(0)
        t = d[i] + _MASK + np.uint32(1) - ci - borrow2
        d2.append(t & _MASK)
        borrow2 = np.uint32(1) - (t >> 16)
    return [jnp.where(ge, d[i], d2[i]) for i in range(NL)]


def _rows(ref):
    return [ref[i, :] for i in range(NL)]


def _write(ref, rows):
    for i in range(NL):
        ref[i, :] = rows[i]


def _cube_lanes(a, zero):
    return _mul_lanes(_mul_lanes(a, a, zero), a, zero)


def _mul_kernel(a_ref, b_ref, o_ref):
    a, b = _rows(a_ref), _rows(b_ref)
    _write(o_ref, _mul_lanes(a, b, jnp.zeros_like(a[0])))


def _dif_kernel(a_ref, b_ref, tw_ref, u_ref, v_ref):
    a, b, tw = _rows(a_ref), _rows(b_ref), _rows(tw_ref)
    zero = jnp.zeros_like(a[0])
    _write(u_ref, _add_lanes(a, b, zero))
    _write(v_ref, _mul_lanes(_sub_lanes(a, b, zero), tw, zero))


def _dit_kernel(a_ref, b_ref, tw_ref, u_ref, v_ref):
    """u = a + tw*b, v = a - tw*b (the DIF stage's transpose)."""
    a, b, tw = _rows(a_ref), _rows(b_ref), _rows(tw_ref)
    zero = jnp.zeros_like(a[0])
    wb = _mul_lanes(tw, b, zero)
    _write(u_ref, _add_lanes(a, wb, zero))
    _write(v_ref, _sub_lanes(a, wb, zero))


def _bcast(rows, like):
    """Broadcast [16, 1]-block rows across the lane width of `like`."""
    return [jnp.broadcast_to(r, like.shape) for r in rows]


def _scale_kernel(a_ref, s_ref, o_ref):
    a = _rows(a_ref)
    s = _bcast(_rows(s_ref), a[0])
    _write(o_ref, _mul_lanes(a, s, jnp.zeros_like(a[0])))


def _db_kernel(p_ref, pr_ref, xs_ref, k_ref, zni_ref, iz2_ref,
               last_ref, slope_ref, ia_ref, d_ref, b_ref):
    """Constraint / quotient / boundary pointwise map (SURVEY §4.1
    steps 5-7) as ONE VMEM-resident kernel:
      C  = P(g1 x) - P(x)^3 - K(x)
      D  = C * (x - last) * Znum^-1
      B  = (P - (ia + slope*x)) * Z2^-1
    """
    p, pr, xs = _rows(p_ref), _rows(pr_ref), _rows(xs_ref)
    k, zni, iz2 = _rows(k_ref), _rows(zni_ref), _rows(iz2_ref)
    zero = jnp.zeros_like(p[0])
    last = _bcast(_rows(last_ref), p[0])
    slope = _bcast(_rows(slope_ref), p[0])
    ia = _bcast(_rows(ia_ref), p[0])

    c = _sub_lanes(_sub_lanes(pr, _cube_lanes(p, zero), zero), k, zero)
    xml = _sub_lanes(xs, last, zero)
    _write(d_ref, _mul_lanes(_mul_lanes(c, xml, zero), zni, zero))
    i_ev = _add_lanes(ia, _mul_lanes(slope, xs, zero), zero)
    _write(b_ref, _mul_lanes(_sub_lanes(p, i_ev, zero), iz2, zero))


def _l_kernel(d_ref, p_ref, b_ref, cp_ref, cb_ref, o_ref):
    """L = D + coef_p(x)*P + coef_b(x)*B (SURVEY §4.1 step 9)."""
    d, p, b = _rows(d_ref), _rows(p_ref), _rows(b_ref)
    cp, cb = _rows(cp_ref), _rows(cb_ref)
    zero = jnp.zeros_like(d[0])
    t = _add_lanes(_mul_lanes(p, cp, zero), _mul_lanes(b, cb, zero), zero)
    _write(o_ref, _add_lanes(d, t, zero))


def _fold4_kernel(y0_ref, y1_ref, y2_ref, y3_ref, ip_ref, sx_ref,
                  eta_ref, inv4_ref, o_ref):
    """FRI fold-by-4 at special_x (closed form, ops/fri_fold.py math):
    column = inv4 * (((a3*u + a2)*u + a1)*u + a0) with
    u = sx * g^-i, a0..a3 the 4-point DFT of (y0..y3) using eta."""
    y0, y1 = _rows(y0_ref), _rows(y1_ref)
    y2, y3 = _rows(y2_ref), _rows(y3_ref)
    ip = _rows(ip_ref)
    zero = jnp.zeros_like(y0[0])
    sx = _bcast(_rows(sx_ref), y0[0])
    eta = _bcast(_rows(eta_ref), y0[0])
    inv4 = _bcast(_rows(inv4_ref), y0[0])

    e0 = _add_lanes(y0, y2, zero)
    d02 = _sub_lanes(y0, y2, zero)
    e1 = _add_lanes(y1, y3, zero)
    d13 = _sub_lanes(y1, y3, zero)
    a0 = _add_lanes(e0, e1, zero)
    a2 = _sub_lanes(e0, e1, zero)
    h = _mul_lanes(d13, eta, zero)
    a1 = _sub_lanes(d02, h, zero)
    a3 = _add_lanes(d02, h, zero)
    u = _mul_lanes(sx, ip, zero)
    acc = _add_lanes(_mul_lanes(u, a3, zero), a2, zero)
    acc = _add_lanes(_mul_lanes(u, acc, zero), a1, zero)
    acc = _add_lanes(_mul_lanes(u, acc, zero), a0, zero)
    _write(o_ref, _mul_lanes(acc, inv4, zero))


def _interpret() -> bool:
    # Compiled Mosaic kernels require a real TPU; the CPU test backend
    # runs the same kernels in Pallas interpret mode (bit-identical).
    return jax.default_backend() == "cpu"


@functools.partial(jax.jit, static_argnames=("blk",))
def mul_t(a_t, b_t, blk: int = 2048):
    """(a * b) mod p on limb-major [16, N] operands."""
    n = a_t.shape[1]
    blk = min(blk, n)
    return pl.pallas_call(
        _mul_kernel,
        out_shape=jax.ShapeDtypeStruct((NL, n), jnp.uint32),
        grid=(n // blk,),
        in_specs=[pl.BlockSpec((NL, blk), lambda i: (0, i))] * 2,
        out_specs=pl.BlockSpec((NL, blk), lambda i: (0, i)),
        interpret=_interpret(),
    )(a_t, b_t)


@functools.partial(jax.jit, static_argnames=("blk",))
def dif_stage_t(a_t, b_t, tw_t, blk: int = 2048):
    """One DIF butterfly: u = a + b, v = (a - b) * tw; [16, N] each."""
    n = a_t.shape[1]
    blk = min(blk, n)
    return pl.pallas_call(
        _dif_kernel,
        out_shape=(jax.ShapeDtypeStruct((NL, n), jnp.uint32),
                   jax.ShapeDtypeStruct((NL, n), jnp.uint32)),
        grid=(n // blk,),
        in_specs=[pl.BlockSpec((NL, blk), lambda i: (0, i))] * 3,
        out_specs=(pl.BlockSpec((NL, blk), lambda i: (0, i)),
                   pl.BlockSpec((NL, blk), lambda i: (0, i))),
        interpret=_interpret(),
    )(a_t, b_t, tw_t)


def _add_kernel(a_ref, b_ref, o_ref):
    a, b = _rows(a_ref), _rows(b_ref)
    _write(o_ref, _add_lanes(a, b, jnp.zeros_like(a[0])))


def _sub_kernel(a_ref, b_ref, o_ref):
    a, b = _rows(a_ref), _rows(b_ref)
    _write(o_ref, _sub_lanes(a, b, jnp.zeros_like(a[0])))


def _cube_kernel(a_ref, o_ref):
    a = _rows(a_ref)
    _write(o_ref, _cube_lanes(a, jnp.zeros_like(a[0])))


def _ew(kernel, n_in: int):
    """Elementwise [16, N] pallas_call builder (uniform blocking)."""

    @functools.partial(jax.jit, static_argnames=("blk",))
    def run(*ops, blk: int = 2048):
        n = ops[0].shape[1]
        blk = min(blk, n)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((NL, n), jnp.uint32),
            grid=(n // blk,),
            in_specs=[pl.BlockSpec((NL, blk), lambda i: (0, i))] * n_in,
            out_specs=pl.BlockSpec((NL, blk), lambda i: (0, i)),
            interpret=_interpret(),
        )(*ops)

    return run


add_t = _ew(_add_kernel, 2)
sub_t = _ew(_sub_kernel, 2)
cube_t = _ew(_cube_kernel, 1)


# ---------------------------------------------------------------------------
# Round-4 prover-integration kernels. Conventions shared by all:
# operands are limb-major [16, N] uint32; per-element tables are blocked
# like the data; scalar field elements are [16, 1] blocks broadcast
# inside the kernel; blk is the VMEM column-block width (grid over
# N/blk). All are bit-identical to the ops/limbs.py XLA forms
# (tests/test_plimbs.py, interpret mode on CPU).
# ---------------------------------------------------------------------------

_SCALAR = lambda: pl.BlockSpec((NL, 1), lambda i: (0, 0))


def _blkspec(blk):
    return pl.BlockSpec((NL, blk), lambda i: (0, i))


def _tab_spec(tab, blk):
    """BlockSpec for a lane-periodic table [16, L]: tiled up to blk when
    L <= blk (callers pass the pre-tiled array), modular block index
    when L > blk."""
    L = tab.shape[1]
    if L <= blk:
        assert blk % L == 0, (L, blk)
        return pl.BlockSpec((NL, blk), lambda i: (0, 0))
    nb = L // blk
    return pl.BlockSpec((NL, blk), lambda i: (0, i % nb))


def tile_cols(tab_t, blk: int):
    """Tile a [16, L] periodic table to max(L, blk) columns so it can be
    consumed with a constant block index."""
    L = tab_t.shape[1]
    if L >= blk:
        return tab_t
    return jnp.tile(tab_t, (1, blk // L))


def dif_stage_x(x_t, tw_t, blk: int = 2048):
    """Full Pease DIF stage on [16, n]: a = x[:, :n/2], b = x[:, n/2:]
    read via block index maps (no XLA slice materialization); returns
    (u, v) = (a + b, (a - b) * tw). Caller interleaves."""
    n = x_t.shape[1]
    half = n // 2
    blk = min(blk, half)
    if half % 128:
        # Mosaic needs lane-block widths divisible by 128 (or the full
        # array width); tiny transforms slice the halves in XLA instead.
        return dif_stage_t(x_t[:, :half], x_t[:, half:], tw_t, blk=half)
    nb = half // blk
    return pl.pallas_call(
        _dif_kernel,
        out_shape=(jax.ShapeDtypeStruct((NL, half), jnp.uint32),
                   jax.ShapeDtypeStruct((NL, half), jnp.uint32)),
        grid=(nb,),
        in_specs=[pl.BlockSpec((NL, blk), lambda i: (0, i)),
                  pl.BlockSpec((NL, blk), lambda i, nb=nb: (0, i + nb)),
                  pl.BlockSpec((NL, blk), lambda i: (0, i))],
        out_specs=(pl.BlockSpec((NL, blk), lambda i: (0, i)),
                   pl.BlockSpec((NL, blk), lambda i: (0, i))),
        interpret=_interpret(),
    )(x_t, x_t, tw_t)


def dit_stage_t(a_t, b_t, tw_t, blk: int = 2048):
    """One DIT butterfly stage: (u, v) = (a + tw*b, a - tw*b)."""
    n = a_t.shape[1]
    blk = min(blk, n)
    return pl.pallas_call(
        _dit_kernel,
        out_shape=(jax.ShapeDtypeStruct((NL, n), jnp.uint32),
                   jax.ShapeDtypeStruct((NL, n), jnp.uint32)),
        grid=(n // blk,),
        in_specs=[_blkspec(blk)] * 3,
        out_specs=(_blkspec(blk), _blkspec(blk)),
        interpret=_interpret(),
    )(a_t, b_t, tw_t)


def scale_t(x_t, s_t, blk: int = 2048):
    """x * s for a [16, 1] scalar s (e.g. the iNTT 1/n factor)."""
    n = x_t.shape[1]
    blk = min(blk, n)
    return pl.pallas_call(
        _scale_kernel,
        out_shape=jax.ShapeDtypeStruct((NL, n), jnp.uint32),
        grid=(n // blk,),
        in_specs=[_blkspec(blk), _SCALAR()],
        out_specs=_blkspec(blk),
        interpret=_interpret(),
    )(x_t, s_t)


def db_map_t(p_t, pr_t, xs_t, k_tab, zni_tab, iz2_t, last, slope, ia,
             blk: int = 2048):
    """Fused D/B pointwise map over the evaluation domain (one VMEM
    pass; the XLA form materializes ~6 modmuls' worth of HBM temps).
    k_tab/zni_tab are lane-periodic [16, L] tables (see _tab_spec);
    last/slope/ia are [16, 1] scalars. Returns (d_t, b_t)."""
    n = p_t.shape[1]
    blk = min(blk, n)
    return pl.pallas_call(
        _db_kernel,
        out_shape=(jax.ShapeDtypeStruct((NL, n), jnp.uint32),
                   jax.ShapeDtypeStruct((NL, n), jnp.uint32)),
        grid=(n // blk,),
        in_specs=[_blkspec(blk), _blkspec(blk), _blkspec(blk),
                  _tab_spec(k_tab, blk), _tab_spec(zni_tab, blk),
                  _blkspec(blk), _SCALAR(), _SCALAR(), _SCALAR()],
        out_specs=(_blkspec(blk), _blkspec(blk)),
        interpret=_interpret(),
    )(p_t, pr_t, xs_t, k_tab, zni_tab, iz2_t, last, slope, ia)


def mul_tab_t(x_t, tab, blk: int = 2048):
    """x * tab for a lane-periodic [16, L] table (tiled/modular block
    reads — the AIR prover's periodic-coefficient multiplies)."""
    n = x_t.shape[1]
    blk = min(blk, n)
    return pl.pallas_call(
        _mul_kernel,
        out_shape=jax.ShapeDtypeStruct((NL, n), jnp.uint32),
        grid=(n // blk,),
        in_specs=[_blkspec(blk), _tab_spec(tab, blk)],
        out_specs=_blkspec(blk),
        interpret=_interpret(),
    )(x_t, tab)


def l_map_t(d_t, p_t, b_t, cp_tab, cb_tab, blk: int = 2048):
    """L = D + coef_p*P + coef_b*B with lane-periodic coefficient
    tables (period = extension factor)."""
    n = d_t.shape[1]
    blk = min(blk, n)
    return pl.pallas_call(
        _l_kernel,
        out_shape=jax.ShapeDtypeStruct((NL, n), jnp.uint32),
        grid=(n // blk,),
        in_specs=[_blkspec(blk), _blkspec(blk), _blkspec(blk),
                  _tab_spec(cp_tab, blk), _tab_spec(cb_tab, blk)],
        out_specs=_blkspec(blk),
        interpret=_interpret(),
    )(d_t, p_t, b_t, cp_tab, cb_tab)


def fold4_t(values_t, ip_t, sx, eta, inv4, blk: int = 2048):
    """FRI fold-by-4: values [16, n] -> column [16, n/4]. The 4 strided
    rows y_j = values[:, j*q:(j+1)*q] are read via block index maps;
    ip_t = sx-power table g^-i slice [16, q]; sx/eta/inv4 [16, 1]."""
    n = values_t.shape[1]
    q = n // 4
    blk = min(blk, q)
    if q % 128:
        # Tiny tail rounds: XLA-slice the four rows (lane widths < 128
        # can't be blocked in Mosaic) and run one full-width block each.
        return pl.pallas_call(
            _fold4_kernel,
            out_shape=jax.ShapeDtypeStruct((NL, q), jnp.uint32),
            interpret=_interpret(),
        )(values_t[:, :q], values_t[:, q:2 * q], values_t[:, 2 * q:3 * q],
          values_t[:, 3 * q:], ip_t, sx, eta, inv4)
    nb = q // blk

    def yspec(j):
        return pl.BlockSpec((NL, blk), lambda i, j=j, nb=nb: (0, i + j * nb))

    return pl.pallas_call(
        _fold4_kernel,
        out_shape=jax.ShapeDtypeStruct((NL, q), jnp.uint32),
        grid=(nb,),
        in_specs=[yspec(0), yspec(1), yspec(2), yspec(3),
                  _blkspec(blk), _SCALAR(), _SCALAR(), _SCALAR()],
        out_specs=_blkspec(blk),
        interpret=_interpret(),
    )(values_t, values_t, values_t, values_t, ip_t, sx, eta, inv4)
