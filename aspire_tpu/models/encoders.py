"""Document encoders: contextual-sentence multi-vector and CLS bi-encoder.

TPU re-design of the reference encoders:

  * `sentence_pool` fuses the reference's per-sentence Python mask loop
    (disent_models.py:513-534 builds a dense [b, t, 768] numpy mask per
    sentence) into ONE one-hot segment-mean einsum that XLA maps onto the MXU.
    Token->sentence assignment arrives as a compact `sent_ids` array instead
    of ragged Python index lists.
  * `ConSentEncoder` == AspireConSent (examples/ex_aspire_consent.py:25-101):
    BERT forward, CLS doc rep + per-sentence mean-pooled reps.
  * `BiEncoder` == MySPECTER / AspireBiEnc (disent_models.py:24-205,
    ex_aspire_bienc.py:24-57): softmax scalar-mix over the 13 hidden-state
    layers, CLS rep.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .bert import BertConfig, BertModel


def sentence_pool(hidden: jax.Array, sent_ids: jax.Array, max_sents: int) -> jax.Array:
    """Mean-pool contextual token embeddings into per-sentence vectors.

    hidden:   f32[b, t, h] -- final BERT hidden states.
    sent_ids: i32[b, t] -- sentence index per token; -1 for tokens outside
              abstract sentences (CLS/SEP/title/pad).
    Returns f32[b, max_sents, h]; sentences with no tokens give zero vectors
    (the reference divides by clamp(count, 1) -- same result).
    """
    one_hot = (sent_ids[:, :, None] == jnp.arange(max_sents, dtype=jnp.int32)[None, None, :])
    one_hot = one_hot.astype(hidden.dtype)
    sums = jnp.einsum("bts,bth->bsh", one_hot, hidden,
                      preferred_element_type=jnp.float32)
    counts = jnp.maximum(jnp.sum(one_hot, axis=1), 1.0)
    return sums / counts[:, :, None]


class ConSentEncoder(nn.Module):
    """Contextual sentence multi-vector encoder (AspireConSent).

    __call__(token_ids, attn_mask, sent_ids, token_type_ids=None)
      -> (doc_cls f32[b, h], sent_reps f32[b, max_sents, h])
    """

    config: BertConfig
    max_sents: int = 24
    dtype: Any = jnp.float32
    attention_impl: str = "auto"
    hidden_dropout_impl: str = "auto"
    ffn_impl: str = "auto"

    @nn.compact
    def __call__(self, token_ids, attn_mask, sent_ids, token_type_ids=None,
                 deterministic: bool = True):
        last, _ = BertModel(self.config, self.dtype, self.attention_impl,
                            self.hidden_dropout_impl,
                            ffn_impl=self.ffn_impl, name="bert")(
            token_ids, attn_mask, token_type_ids, deterministic)
        doc_cls = last[:, 0, :]
        sent_reps = sentence_pool(last, sent_ids, self.max_sents)
        return doc_cls, sent_reps


def span_pool(hidden: jax.Array, span_mask: jax.Array) -> jax.Array:
    """Mean-pool token embeddings over arbitrary (possibly overlapping) spans.

    hidden: f32[b, t, h]; span_mask: f32[b, e, t] (1.0 at member tokens).
    Returns f32[b, e, h]; all-zero spans give zero vectors.  One einsum on
    the MXU -- the TPU form of the reference's per-entity gather loop
    (AspireConSenContextual._get_ner_reps, utils/models.py:465-477)."""
    m = span_mask.astype(hidden.dtype)
    sums = jnp.einsum("bet,bth->beh", m, hidden,
                      preferred_element_type=jnp.float32)
    counts = jnp.maximum(jnp.sum(m, axis=2), 1.0)
    return sums / counts[:, :, None]


class ConSentSpanEncoder(nn.Module):
    """ConSentEncoder + per-entity token-span reps in sentence context.

    The reference's AspireConSenContextual (utils/models.py:413-507): the
    same BERT forward yields contextual sentence reps AND, for each NER
    entity, the mean of its token states inside the sentence it occurs in.
    Parameter tree is identical to ConSentEncoder ({"bert": ...}), so any
    aspire checkpoint loads unchanged.

    __call__(token_ids, attn_mask, sent_ids, span_mask)
      -> (doc_cls f32[b,h], sent_reps f32[b,max_sents,h], ent_reps f32[b,e,h])
    """

    config: BertConfig
    max_sents: int = 24
    dtype: Any = jnp.float32
    attention_impl: str = "auto"
    hidden_dropout_impl: str = "auto"
    ffn_impl: str = "auto"

    @nn.compact
    def __call__(self, token_ids, attn_mask, sent_ids, span_mask,
                 token_type_ids=None, deterministic: bool = True):
        last, _ = BertModel(self.config, self.dtype, self.attention_impl,
                            self.hidden_dropout_impl,
                            ffn_impl=self.ffn_impl, name="bert")(
            token_ids, attn_mask, token_type_ids, deterministic)
        doc_cls = last[:, 0, :]
        sent_reps = sentence_pool(last, sent_ids, self.max_sents)
        ent_reps = span_pool(last, span_mask)
        return doc_cls, sent_reps, ent_reps


class BiEncoder(nn.Module):
    """CLS bi-encoder with softmax scalar-mix over layers (MySPECTER).

    The mix weights mirror SoftmaxMixLayers (generic_layers.py:71-80): a
    learned [layer_count] vector, softmaxed, weighting the per-layer CLS reps.
    """

    config: BertConfig
    dtype: Any = jnp.float32
    attention_impl: str = "auto"
    hidden_dropout_impl: str = "auto"
    ffn_impl: str = "auto"

    @nn.compact
    def __call__(self, token_ids, attn_mask, token_type_ids=None,
                 deterministic: bool = True):
        _, hidden_states = BertModel(self.config, self.dtype,
                                     self.attention_impl,
                                     self.hidden_dropout_impl,
                                     ffn_impl=self.ffn_impl, name="bert")(
            token_ids, attn_mask, token_type_ids, deterministic)
        n_layers = len(hidden_states)
        w = self.param("layer_weights", nn.initializers.zeros, (n_layers,), jnp.float32)
        mix = jax.nn.softmax(w)
        cls_stack = jnp.stack([h[:, 0, :] for h in hidden_states], axis=-1)  # [b, h, L]
        return jnp.einsum("bhl,l->bh", cls_stack, mix,
                          preferred_element_type=jnp.float32)


def bienc_layer_weights_from_state_dict(state_dict) -> jnp.ndarray:
    """Extract SoftmaxMixLayers weights ([1, 13] torch) -> [13] flax param."""
    import numpy as np
    for key in ("bert_layer_weights.weight", "bert_layer_weights"):
        if key in state_dict:
            w = state_dict[key]
            if hasattr(w, "detach"):
                w = w.detach().cpu().numpy()
            return jnp.asarray(np.asarray(w, dtype=np.float32).reshape(-1))
    raise KeyError("bert_layer_weights not found in state dict")
