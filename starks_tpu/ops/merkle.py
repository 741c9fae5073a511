"""Layer-parallel Merkle trees over evaluation tables.

TPU-native replacement for the reference's sequential right-to-left flat
array build (`starks/merkle_tree.py`, SURVEY.md §4.5): level k's 2^k
hashes run as ONE batched blake2s call, log2(N) calls total. Leaf and
node byte formats match §A.4 exactly: leaves are the raw 32-byte
big-endian values (or 96-byte P||D||B composites), unhashed; parent =
blake2s(left || right); branches are [leaf, sibling leaf, digest
siblings...] bottom-up.
"""

import jax
import jax.numpy as jnp
import numpy as np

from . import blake2s as b2
from . import limbs as fl
from ..utils.conversions import digest_words_to_bytes, limbs_to_be_bytes


@jax.jit
def _leaf_words_32(leaves):
    return b2.limbs_to_words(leaves)


@jax.jit
def _leaf_words_96(p, d, b):
    return jnp.concatenate(
        [b2.limbs_to_words(p), b2.limbs_to_words(d), b2.limbs_to_words(b)],
        axis=-1)


def _hash_level(words):
    """[M, W] leaf/digest words -> [M/2, 8] parent digests.

    NOT wrapped in an outer jit: blake2s_words host-loops its blocks as
    individually-jitted compress calls, which keeps compile time LINEAR
    in leaf width (an outer jit would inline the chain and blow up for
    wide multi-column AIR leaves)."""
    m, w = words.shape
    paired = words.reshape(m // 2, 2 * w)
    return b2.blake2s_words(paired, 2 * w * 4)


class MerkleTree:
    """Device-resident Merkle tree: leaf words [N, W] plus digest levels
    [N/2, 8] ... [1, 8]. Root and branches are extracted on host."""

    def __init__(self, leaf_words):
        n = leaf_words.shape[0]
        assert n & (n - 1) == 0
        self.n = n
        self.leaf_words = leaf_words
        self.levels = []
        level = _hash_level(leaf_words)
        self.levels.append(level)
        while level.shape[0] > 1:
            level = _hash_level(level)
            self.levels.append(level)
        self._root_bytes = None

    @classmethod
    def from_values(cls, leaves):
        """32-byte leaves from [N, 16] limb values."""
        return cls(_leaf_words_32(leaves))

    @classmethod
    def from_pdb(cls, p, d, b):
        """96-byte P||D||B composite leaves (the main STARK tree)."""
        return cls(_leaf_words_96(p, d, b))

    @property
    def root_words(self):
        """Device [8] digest words of the root — no host transfer."""
        return self.levels[-1][0]

    @property
    def root(self) -> bytes:
        if self._root_bytes is None:
            self._root_bytes = digest_words_to_bytes(
                np.asarray(self.levels[-1][0]))
        return self._root_bytes

    def leaf_bytes(self, indices) -> list:
        """Raw leaf byte strings at the given indices."""
        idx = jnp.asarray(np.asarray(indices, np.int32))
        rows = np.asarray(jnp.take(self.leaf_words, idx, axis=0))
        return [digest_words_to_bytes(r) for r in rows]

    def branch_bundle(self, indices):
        """All authentication data for `indices` as ONE device array
        [K, 2W + 8*(levels-1)] of uint32 words (layout: leaf, sibling
        leaf, digest sibling per level bottom-up, root level omitted).
        Indices may be a device int32 array — the transcript never has
        to leave the device; decode on host with `bundle_to_branches`."""
        idx = jnp.asarray(indices, jnp.int32)
        parts = [jnp.take(self.leaf_words, idx, axis=0),
                 jnp.take(self.leaf_words, idx ^ 1, axis=0)]
        node = idx >> 1
        for level in self.levels[:-1]:
            parts.append(jnp.take(level, node ^ 1, axis=0))
            node = node >> 1
        return jnp.concatenate(parts, axis=-1)

    @property
    def leaf_width_words(self) -> int:
        return int(self.leaf_words.shape[-1])

    def bundle_width_words(self) -> int:
        return 2 * self.leaf_width_words + 8 * (len(self.levels) - 1)

    @staticmethod
    def bundle_to_branches(bundle_np, leaf_width_words: int) -> list:
        """Host decode of a fetched branch bundle into reference-format
        branches [leaf, sibling leaf, digest siblings...]."""
        k, total = bundle_np.shape
        w = leaf_width_words
        n_levels = (total - 2 * w) // 8
        # ONE numpy->bytes conversion for the whole bundle, then cheap
        # bytes slicing (a per-cell tobytes() loop cost ~30 ms of the
        # proof assembly at 2^13; this form is ~1 ms).
        buf = np.ascontiguousarray(bundle_np).astype('<u4',
                                                     copy=False).tobytes()
        row_b = 4 * total
        out = []
        for r in range(k):
            base = r * row_b
            branch = [buf[base:base + 4 * w],
                      buf[base + 4 * w:base + 8 * w]]
            off = base + 8 * w
            for _ in range(n_levels):
                branch.append(buf[off:off + 32])
                off += 32
            out.append(branch)
        return out

    def branches(self, indices) -> list:
        """Authentication branches in the reference format (SURVEY §4.5):
        [leaf, sibling leaf, sibling digest per level...] bottom-up.
        One fused device gather + ONE device->host transfer."""
        idx = jnp.asarray(np.asarray(indices, np.int32))
        bundle = np.asarray(self.branch_bundle(idx))
        return self.bundle_to_branches(bundle, self.leaf_width_words)


def merkelize_limbs(values) -> MerkleTree:
    """Reference `merkelize` on [N, 16] limb values (32-byte leaves)."""
    return MerkleTree.from_values(values)
