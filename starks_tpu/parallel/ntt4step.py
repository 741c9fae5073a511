"""Sharded four-step NTT over a device mesh.

The SP-analog subsystem (SURVEY.md §3.2/§6): the radix-2 butterfly
network's all-stage cross-shard dependency is restructured as
N = N1 x N2 four-step form so that ALL inter-chip communication is three
all-to-all transposes over ICI (exactly the Ulysses-style trade), with
everything between them purely local:

    view [N1, N2] -> (A2A) shard by n2 -> local size-N1 NTTs batched
    over n2 -> twiddle w^(n2*k1) -> (A2A) shard by k1 -> local size-N2
    NTTs -> (A2A) back to natural contiguous order.

Implemented as small jitted stages with explicit sharding constraints —
GSPMD lowers the resharding transitions to all-to-all collectives; the
local batched stages reuse the per-stage butterfly kernels. Bit-exact
with the single-chip NTT (tests/test_parallel.py compares against the
oracle FFT on an 8-device CPU mesh).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops import limbs as fl
from ..ops import ntt as ntt_mod


def _butterfly_stage_raw(x, tw):
    """One DIT stage along axis 1 of [B, n, 16]."""
    b, n = x.shape[0], x.shape[1]
    m = tw.shape[0]
    xr = x.reshape(b, n // (2 * m), 2, m, fl.NUM_LIMBS)
    u = xr[:, :, 0]
    v = fl.mul(xr[:, :, 1], tw[None, None])
    out = jnp.stack([fl.add(u, v), fl.sub(u, v)], axis=2)
    return out.reshape(b, n, fl.NUM_LIMBS)


_butterfly_stage_batched = jax.jit(_butterfly_stage_raw)


@jax.jit
def _gather_axis1(x, idx):
    return jnp.take(x, idx, axis=1)


def ntt_batched(x, domain: ntt_mod.Domain, inverse: bool = False):
    """Batched NTT along axis 1 of [B, n, 16] (host-looped small stages)."""
    assert x.shape[1] == domain.n
    x = _gather_axis1(x, domain.brev)
    for tw in domain.stage_twiddles(inverse):
        x = _butterfly_stage_batched(x, tw)
    if inverse:
        x = ntt_mod._scale(x, domain.n_inv_limbs)
    return x


class FourStepPlan:
    """Precomputed decomposition + twiddles for one (n, g, mesh) triple."""

    def __init__(self, n: int, g: int, mesh, n1: int = None):
        self.n = n
        self.g = g
        self.mesh = mesh
        s = mesh.shape["shard"]
        if n1 is None:
            n1 = 1 << ((n.bit_length() - 1) // 2)
            n1 = max(n1, s)
        n2 = n // n1
        assert n1 % s == 0 and n2 % s == 0, (n1, n2, s)
        self.n1, self.n2 = n1, n2
        # Inner domains: NTT_N1 uses w^(N2), NTT_N2 uses w^(N1).
        self.dom1 = ntt_mod.get_domain(n1, pow(g, n2, fl.MODULUS))
        self.dom2 = ntt_mod.get_domain(n2, pow(g, n1, fl.MODULUS))
        self.outer = ntt_mod.get_domain(n, g)
        self._tw = {}

    def twiddle(self, inverse: bool):
        """[N2, N1, 16] table of w^(+-n2*k1), sharded by n2 rows."""
        if inverse not in self._tw:
            table = (self.outer.inv_powers_view if inverse
                     else self.outer.powers)
            k1 = np.arange(self.n1, dtype=np.int64)[None, :]
            n2 = np.arange(self.n2, dtype=np.int64)[:, None]
            idx = jnp.asarray(((n2 * k1) % self.n).astype(np.int32))
            w = jnp.take(table, idx.reshape(-1), axis=0)
            w = w.reshape(self.n2, self.n1, fl.NUM_LIMBS)
            w = jax.device_put(w, NamedSharding(self.mesh, P("shard", None, None)))
            self._tw[inverse] = w
        return self._tw[inverse]


_PLANS = {}


def get_plan(n: int, g: int, mesh) -> FourStepPlan:
    key = (n, g, id(mesh))
    if key not in _PLANS:
        _PLANS[key] = FourStepPlan(n, g, mesh)
    return _PLANS[key]


def _constrain(x, mesh, spec):
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def _ntt_local_axis1(x, domain: ntt_mod.Domain, inverse: bool):
    """Traced batched NTT along axis 1 of [B, n, 16] (single graph; used
    inside shard_map where stage-per-dispatch would defeat the point)."""
    x = jnp.take(x, domain.brev, axis=1)
    for tw in domain.stage_twiddles(inverse):
        x = _butterfly_stage_raw(x, tw)
    if inverse:
        x = ntt_mod._scale(x, domain.n_inv_limbs)
    return x


def fourstep_ntt_shmap(values, plan: FourStepPlan, inverse: bool = False):
    """Four-step NTT as ONE `shard_map` program with an EXPLICIT
    collective schedule: exactly three `lax.all_to_all`s over the
    "shard" axis (the controlled version of `fourstep_ntt`'s
    GSPMD-incidental resharding; SURVEY §8 Phase 7a). Local compute
    between collectives is a single traced graph per device.

    Layout walk (s = shard count, natural order in/out, contiguous row
    sharding in/out; tests pin both bit-exactness and the collective
    count):
      [n/s]        view [n1/s, n2]
      A2A #1    -> [n1, n2/s]    local size-n1 NTTs batched over n2/s
      twiddle      w^(n2*k1) (local slice of the sharded table)
      A2A #2    -> [n2, n1/s]    local size-n2 NTTs batched over n1/s
      A2A #3    -> [n1, n2/s] -> transpose -> contiguous X rows
    """
    from jax.experimental.shard_map import shard_map
    import functools as ft

    mesh, n1, n2 = plan.mesh, plan.n1, plan.n2
    s = mesh.shape["shard"]
    NL = fl.NUM_LIMBS
    tw_table = plan.twiddle(inverse)
    # Materialize the lazy domain caches EAGERLY: first touch inside the
    # shard_map trace would cache tracers (UnexpectedTracerError on the
    # next call — hit by scripts/scaling_ntt.py, where this entry point
    # runs before any eager NTT has warmed the caches).
    for dom in (plan.dom1, plan.dom2):
        dom.brev
        dom.stage_twiddles(inverse)
        if inverse:
            dom.n_inv_limbs

    def body(vals_l, tw_l):
        a = vals_l.reshape(n1 // s, n2, NL)
        a = jax.lax.all_to_all(a, "shard", split_axis=1, concat_axis=0,
                               tiled=True)               # [n1, n2/s, 16]
        a = jnp.transpose(a, (1, 0, 2))                  # [n2/s, n1, 16]
        a = _ntt_local_axis1(a, plan.dom1, inverse)      # [n2/s, k1, 16]
        a = fl.mul(a, tw_l)
        a = jax.lax.all_to_all(a, "shard", split_axis=1, concat_axis=0,
                               tiled=True)               # [n2, n1/s, 16]
        a = jnp.transpose(a, (1, 0, 2))                  # [n1/s, n2, 16]
        a = _ntt_local_axis1(a, plan.dom2, inverse)      # [n1/s, k2, 16]
        a = jax.lax.all_to_all(a, "shard", split_axis=1, concat_axis=0,
                               tiled=True)               # [n1, k2/s, 16]
        a = jnp.transpose(a, (1, 0, 2))                  # [k2/s, n1, 16]
        return a.reshape((n2 // s) * n1, NL)

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P("shard"), P("shard", None, None)),
                   out_specs=P("shard"))
    sharding = NamedSharding(mesh, P("shard"))
    values = jax.device_put(values, sharding)
    return jax.jit(fn)(values, tw_table)


def fourstep_ntt(values, plan: FourStepPlan, inverse: bool = False):
    """NTT of [n, 16] values (natural order in/out, contiguous row
    sharding in/out) via the sharded four-step schedule."""
    n1, n2, mesh = plan.n1, plan.n2, plan.mesh

    # [N] -> A[n1, n2]; reshard so n2 is the sharded axis, n1 local-full.
    a = values.reshape(n1, n2, fl.NUM_LIMBS)
    a = jax.jit(lambda t: jnp.transpose(t, (1, 0, 2)),
                out_shardings=NamedSharding(mesh, P("shard", None, None)))(a)

    # Local column NTTs (size n1, batched over local n2 rows).
    a = ntt_batched(a, plan.dom1, inverse)          # [n2, k1, 16]

    # Twiddle w^(n2*k1), sharded identically.
    a = jax.jit(fl.mul)(a, plan.twiddle(inverse))

    # Reshard: k1 becomes the sharded axis (all-to-all), n2 local-full.
    a = jax.jit(lambda t: jnp.transpose(t, (1, 0, 2)),
                out_shardings=NamedSharding(mesh, P("shard", None, None)))(a)

    # Local row NTTs (size n2, batched over local k1 rows). [k1, k2, 16]
    a = ntt_batched(a, plan.dom2, inverse)

    # Natural order: X[k1 + k2*n1] -> view [k2, k1]; reshard contiguous.
    # No extra inverse scale here: the two inner inverse NTTs already
    # scaled by 1/n1 and 1/n2, and (1/n1)(1/n2) = 1/n.
    a = jax.jit(lambda t: jnp.transpose(t, (1, 0, 2)).reshape(
        plan.n, fl.NUM_LIMBS),
        out_shardings=NamedSharding(mesh, P("shard", None)))(a)
    return a
