"""Device-resident Fiat-Shamir transcript.

The tunneled TPU runtime's device->host latency (~25 ms per transfer,
measured) makes a host-side transcript the prover's bottleneck: every
challenge derivation forced a root transfer, every branch extraction a
gather round-trip — ~20+ transfers per proof. This module computes the
ENTIRE transcript on device with the batched blake2s kernel
(ops/blake2s.py), so the only device->host transfer in a proof is the
final proof-bytes bundle.

Byte semantics are identical to the host engine (starks_tpu/transcript.py,
SURVEY §A.3/§A.5) — digests are bit-equal, challenge ints are reduced
mod p on entry to field arithmetic (sound because they only ever appear
inside mod-p expressions), and query indices replicate the
seed-extension + exclusion-remap loop exactly. Parity is tested in
tests/test_transcript_dev.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from . import blake2s as b2
from . import limbs as fl


@jax.jit
def special_x_limbs(root_words):
    """int(root) mod p as [16] limbs, from [8] digest words (device).

    The digest value is < 2^256 < 2p, so one conditional subtract
    canonicalizes (SURVEY §A.5 'special_x = int(m_root) mod p')."""
    return fl._cond_sub_p(b2.words_to_limbs(root_words))


@jax.jit
def _challenge_block(root_words, suffix_word):
    """blake2s(root_bytes || byte(j)) for a 33-byte message, as limbs of
    the digest's big-endian integer reduced mod p."""
    batch = root_words.shape[:-1]
    pad = jnp.zeros(batch + (7,), jnp.uint32)
    m = jnp.concatenate(
        [root_words, jnp.broadcast_to(suffix_word, batch + (1,)), pad],
        axis=-1)
    digest = b2.blake2s_words(m, 33)
    return fl._cond_sub_p(b2.words_to_limbs(digest))


def challenge_limbs(root_words, suffix: int):
    """k_j = int(blake2s(root || bytes([j]))) mod p, on device.

    The reference keeps k_j unreduced (SURVEY §A.5) but every use is
    inside mod-p arithmetic, so reducing here is transcript-equivalent."""
    return _challenge_block(root_words, jnp.uint32(suffix))


def _byteswap32(x):
    return (((x & 0x000000FF) << 24) | ((x & 0x0000FF00) << 8)
            | ((x & 0x00FF0000) >> 8) | (x >> 24))


def pseudorandom_indices_dev(root_words, modulus: int, count: int,
                             exclude_multiples_of: int = 0):
    """Query indices from a device digest: extend the seed by iterated
    blake2s of the last 32 bytes, read 4-byte BIG-endian words, reduce,
    exclusion-remap (same math as transcript.pseudorandom_indices).
    Returns an int32 [count] device array. modulus/count/exclude are
    static Python ints."""
    assert modulus < 2**24
    n_digests = (4 * count + 31) // 32      # seed + (n_digests-1) more
    chunks = [root_words]
    last = root_words
    for _ in range(n_digests - 1):
        pad = jnp.zeros(last.shape[:-1] + (8,), jnp.uint32)
        last = b2.blake2s_words(jnp.concatenate([last, pad], axis=-1), 32)
        chunks.append(last)
    words = jnp.concatenate(chunks, axis=-1)[..., :count]
    be = _byteswap32(words)
    if exclude_multiples_of == 0:
        return (be % jnp.uint32(modulus)).astype(jnp.int32)
    ex = exclude_multiples_of
    real_modulus = modulus * (ex - 1) // ex
    o = be % jnp.uint32(real_modulus)
    return (o + 1 + o // jnp.uint32(ex - 1)).astype(jnp.int32)


# -- small device field helpers for transcript-adjacent math ------------

@jax.jit
def lincomb_coeffs(k_lin, k_adj, h_pows):
    """(k_lin + k_adj * h^i) mod p for a tiny [E, 16] power table — the
    8-periodic combined linear-combination coefficients (prover step 9)."""
    return fl.add(k_lin[None], fl.mul(k_adj[None], h_pows))
