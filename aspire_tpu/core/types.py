"""Core pytree structs used across the framework.

The reference (allenai/aspire) passes multi-vector document representations
around as `namedtuple('RepLen', ['embed', 'abs_lens'])` with `embed` a
`[batch, dim, max_sents]` torch tensor and `abs_lens` a Python list
(src/learning/facetid_models/disent_models.py:15-21).  On TPU everything must
be a statically-shaped array, so we carry lengths as an int32 array and derive
masks on the fly; embeddings are stored row-major `[batch, max_sents, dim]`
(sentences on the sublane axis) which is the layout the MXU wants for the
pairwise-distance matmuls.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

# The reference uses -10e8 (== -1e9) as the additive pad-mask value
# (src/learning/facetid_models/pair_distances.py:39).  Keep the exact constant:
# downstream softmaxes and max-reductions depend on it.
PAD_NEG = -10e8

# Mask value used by the reference's masked softmaxes
# (src/learning/models_common/activations.py:25,52-53).
SOFTMAX_NEG = -1e32


@struct.dataclass
class MultiVec:
    """A batch of multi-vector (per-sentence) document representations.

    embed: f32[batch, max_sents, dim] -- contextual sentence embeddings,
        zero-padded past `lens`.
    lens:  i32[batch] -- number of valid sentences per document.
    align: optional i32[batch, 2] -- (query_sent_idx, cand_sent_idx) supervised
        alignment pairs (reference `align_idxs`, pair_distances.py:206).
    """

    embed: jax.Array
    lens: jax.Array
    align: jax.Array | None = None

    @property
    def batch(self) -> int:
        return self.embed.shape[0]

    @property
    def max_sents(self) -> int:
        return self.embed.shape[1]

    @property
    def dim(self) -> int:
        return self.embed.shape[2]

    def sent_mask(self) -> jax.Array:
        """f32[batch, max_sents]; 1.0 at valid sentences, 0.0 at pads."""
        pos = jnp.arange(self.max_sents, dtype=jnp.int32)[None, :]
        return (pos < self.lens[:, None]).astype(self.embed.dtype)

    def pair_pad_mask(self, other: "MultiVec") -> jax.Array:
        """f32[batch, self.max_sents, other.max_sents]; PAD_NEG additive mask.

        Replicates the reference's dense pad mask: 0.0 inside the
        (ql, cl) valid rectangle, -10e8 outside (pair_distances.py:39-43).
        """
        m = self.sent_mask()[:, :, None] * other.sent_mask()[:, None, :]
        return (1.0 - m) * jnp.asarray(PAD_NEG, self.embed.dtype)


def masked_softmax(scores: jax.Array, lens: jax.Array) -> jax.Array:
    """Softmax over axis 1 restricted to the first `lens` positions.

    Mirrors src/learning/models_common/activations.py:10-32 (additive -1e32
    mask then log_softmax().exp()).
    scores: f32[batch, n]; lens: i32[batch].
    """
    n = scores.shape[1]
    pos = jnp.arange(n, dtype=jnp.int32)[None, :]
    mask = jnp.where(pos < lens[:, None], 0.0, SOFTMAX_NEG).astype(scores.dtype)
    return jax.nn.softmax(scores + mask, axis=1)


def masked_2d_softmax(scores: jax.Array, lens1: jax.Array, lens2: jax.Array) -> jax.Array:
    """Joint softmax over the flattened last two axes, masked to the valid
    (lens1, lens2) rectangle per batch element.

    Mirrors src/learning/models_common/activations.py:35-61.
    scores: f32[batch, n1, n2].
    """
    b, n1, n2 = scores.shape
    p1 = jnp.arange(n1, dtype=jnp.int32)[None, :, None]
    p2 = jnp.arange(n2, dtype=jnp.int32)[None, None, :]
    valid = (p1 < lens1[:, None, None]) & (p2 < lens2[:, None, None])
    masked = scores + jnp.where(valid, 0.0, SOFTMAX_NEG).astype(scores.dtype)
    flat = jax.nn.softmax(masked.reshape(b, n1 * n2), axis=1)
    return flat.reshape(b, n1, n2)
