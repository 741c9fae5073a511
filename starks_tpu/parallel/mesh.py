"""Device mesh construction for sharded proving.

One logical axis `"shard"` covers the domain/leaf dimension (the
SP-analog axis of SURVEY §3.2: trace columns, LDE coset evaluations and
Merkle leaf ranges partition along it); an optional `"batch"` axis covers
independent proofs (DP). On a v5p host the 4 chips form shard=4; across
hosts the batch axis rides DCN while shard stays intra-host on ICI.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_shard: int = None, n_batch: int = 1) -> Mesh:
    devs = jax.devices()
    if n_shard is None:
        n_shard = len(devs) // n_batch
    assert n_shard * n_batch <= len(devs), (n_shard, n_batch, len(devs))
    grid = np.array(devs[:n_shard * n_batch]).reshape(n_batch, n_shard)
    return Mesh(grid, ("batch", "shard"))


def shard_rows(mesh: Mesh):
    """Contiguous row sharding for [N, 16] limb arrays."""
    return NamedSharding(mesh, P("shard", None))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
