"""Multi-chip logic on a virtual 8-device CPU mesh (SURVEY §5: sharded
NTT/Merkle testable without TPUs): four-step NTT vs oracle FFT, sharded
prover transcript identity, batch proving."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oracle.fft import fft as oracle_fft
from starks_tpu.ops import limbs as fl
from starks_tpu.parallel import batch as pbatch
from starks_tpu.parallel import ntt4step
from starks_tpu.parallel.mesh import make_mesh, shard_rows
from starks_tpu.utils.conversions import ints_to_limbs, limbs_to_ints

P = fl.MODULUS
rng = random.Random(21)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(n_shard=8)


class TestFourStep:
    def test_forward_matches_oracle(self, mesh):
        n = 1024
        g = pow(7, (P - 1) // n, P)
        vals = [rng.randrange(P) for _ in range(n)]
        plan = ntt4step.get_plan(n, g, mesh)
        x = jax.device_put(jnp.asarray(ints_to_limbs(vals)), shard_rows(mesh))
        got = limbs_to_ints(np.asarray(ntt4step.fourstep_ntt(x, plan)))
        assert got == oracle_fft(vals, P, g)

    def test_inverse_roundtrip(self, mesh):
        n = 512
        g = pow(7, (P - 1) // n, P)
        vals = [rng.randrange(P) for _ in range(n)]
        plan = ntt4step.get_plan(n, g, mesh)
        x = jax.device_put(jnp.asarray(ints_to_limbs(vals)), shard_rows(mesh))
        fwd = ntt4step.fourstep_ntt(x, plan)
        back = ntt4step.fourstep_ntt(fwd, plan, inverse=True)
        assert limbs_to_ints(np.asarray(back)) == vals

    def test_inverse_matches_oracle(self, mesh):
        n = 512
        g = pow(7, (P - 1) // n, P)
        vals = [rng.randrange(P) for _ in range(n)]
        plan = ntt4step.get_plan(n, g, mesh)
        x = jax.device_put(jnp.asarray(ints_to_limbs(vals)), shard_rows(mesh))
        got = limbs_to_ints(np.asarray(
            ntt4step.fourstep_ntt(x, plan, inverse=True)))
        assert got == oracle_fft(vals, P, g, inv=True)


class TestShardMapFourStep:
    def test_matches_gspmd_path_and_oracle(self, mesh):
        n = 1024
        g = pow(7, (P - 1) // n, P)
        vals = [rng.randrange(P) for _ in range(n)]
        plan = ntt4step.get_plan(n, g, mesh)
        x = jax.device_put(jnp.asarray(ints_to_limbs(vals)),
                           shard_rows(mesh))
        got = limbs_to_ints(np.asarray(
            ntt4step.fourstep_ntt_shmap(x, plan)))
        assert got == oracle_fft(vals, P, g)

    def test_inverse_roundtrip(self, mesh):
        n = 512
        g = pow(7, (P - 1) // n, P)
        vals = [rng.randrange(P) for _ in range(n)]
        plan = ntt4step.get_plan(n, g, mesh)
        x = jax.device_put(jnp.asarray(ints_to_limbs(vals)),
                           shard_rows(mesh))
        fwd = ntt4step.fourstep_ntt_shmap(x, plan)
        back = ntt4step.fourstep_ntt_shmap(fwd, plan, inverse=True)
        assert limbs_to_ints(np.asarray(back)) == vals

    def test_exactly_three_all_to_alls(self, mesh):
        """The collective schedule is explicit: pin it so a regression
        to GSPMD-incidental resharding (extra collectives) fails."""
        from jax.experimental.shard_map import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as PS
        n = 512
        g = pow(7, (P - 1) // n, P)
        plan = ntt4step.get_plan(n, g, mesh)
        x = jax.device_put(
            jnp.asarray(ints_to_limbs([1] * n)),
            NamedSharding(mesh, PS("shard")))
        # Reach the traced computation via make_jaxpr on the same body
        # the public wrapper builds.
        import jax as _jax
        jaxpr = None
        traced = _jax.make_jaxpr(
            lambda v: ntt4step.fourstep_ntt_shmap(v, plan))(x)
        text = str(traced)
        assert text.count("all_to_all") == 3, text.count("all_to_all")


class TestShardedProver:
    def test_sharded_transcript_identical(self, mesh):
        """The sharded prover must emit byte-identical proofs. Compared
        against the pure-Python oracle (sub-second) rather than the
        fused single-chip prover — fused-vs-oracle identity is already
        covered in tests/test_fused.py, and compiling the fused core
        inside this mesh subprocess costs ~10 min of CPU XLA time."""
        from starks_tpu import prover as tp
        from oracle import stark as ostark
        steps = 128
        consts = [(i ** 7) ^ 42 for i in range(32)]
        single = ostark.mk_mimc_proof(3, steps, consts)
        sharded = tp.mk_mimc_proof(3, steps, consts, mesh=mesh)
        assert sharded == single


class TestBatch:
    def test_batched_traces_match_host(self):
        from starks_tpu.models import mimc as mm
        steps = 64
        consts = [(i ** 7) ^ 42 for i in range(16)]
        inps = [5, 7, 11]
        dev = mm.trace_batch_device(
            jnp.asarray(ints_to_limbs(inps)), steps,
            jnp.asarray(ints_to_limbs(consts)))
        arr = np.asarray(jnp.transpose(dev, (1, 0, 2)))
        for i, inp in enumerate(inps):
            assert limbs_to_ints(arr[i]) == mm.trace_host(inp, steps, consts)

    def test_prove_batch_verifies(self):
        from starks_tpu.models.mimc import mimc_forward
        steps = 64
        consts = [(i ** 7) ^ 42 for i in range(16)]
        inps = [123, 456]
        proofs = pbatch.prove_batch(inps, steps, consts)
        outputs = [mimc_forward(i, steps, consts) for i in inps]
        assert pbatch.verify_batch(inps, steps, consts, outputs, proofs) == \
            [True, True]
