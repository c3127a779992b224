"""Sentence-encoder training models (cosentbert / ictsentbert).

TPU re-design of src/learning/facetid_models/sentsim_models.py:11-126:

  * SentTripleModel (cosentbert): one BERT tower, CLS rep, L2 triplet with
    in-batch shuffled negatives.
  * ICTModel (ictsentbert): two towers (sentence + context), cross-entropy
    over the in-batch dot-product similarity matrix.

Both consume the same feature dicts as the doc models (sent_ids unused).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..core.config import ModelHParams
from .bert import BertConfig, BertModel
from .doc_models import _cls_l2_triplet


class SentTripleModel:
    """cosentbert: CLS triplet with in-batch negatives (sentsim_models.py:11-78)."""

    def __init__(self, hp: ModelHParams, bert_config: BertConfig,
                 dtype: Any = jnp.float32):
        self.hp = hp
        self.bert_config = bert_config
        self.encoder = BertModel(bert_config, dtype=dtype,
                                 attention_impl=hp.attention_impl,
                                 hidden_dropout_impl=hp.hidden_dropout_impl,
                                 ffn_impl=hp.ffn_impl)

    def init_params(self, rng: jax.Array, seq_len: int = 64) -> dict:
        ids = jnp.zeros((1, seq_len), jnp.int32)
        return self.encoder.init(rng, ids, jnp.ones_like(ids))["params"]

    def _cls(self, params, feats, deterministic=True, rng=None):
        kwargs = {}
        if not deterministic:
            kwargs = {"deterministic": False, "rngs": {"dropout": rng}}
        last, _ = self.encoder.apply({"params": params}, feats["token_ids"],
                                     feats["attn_mask"], **kwargs)
        return last[:, 0, :]

    def encode(self, params, feats, deterministic=True, rng=None):
        return self._cls(params, feats, deterministic, rng), None

    def train_loss(self, params, batch, rng, train: bool = True) -> jax.Array:
        perm_rng, q_rng, p_rng, n_rng = jax.random.split(rng, 4)
        q = self._cls(params, batch["query"], not train, q_rng)
        p = self._cls(params, batch["pos"], not train, p_rng)
        if "neg" in batch:
            n = self._cls(params, batch["neg"], not train, n_rng)
        else:
            n = p[jax.random.permutation(perm_rng, p.shape[0])]
        return _cls_l2_triplet(q, p, n)


class ICTModel:
    """ictsentbert: two-tower in-batch softmax (sentsim_models.py:81-126)."""

    def __init__(self, hp: ModelHParams, bert_config: BertConfig,
                 dtype: Any = jnp.float32):
        self.hp = hp
        self.bert_config = bert_config
        self.sent_encoder = BertModel(bert_config, dtype=dtype,
                                      attention_impl=hp.attention_impl,
                                      hidden_dropout_impl=hp.hidden_dropout_impl)
        self.context_encoder = BertModel(
            bert_config, dtype=dtype, attention_impl=hp.attention_impl,
                                      hidden_dropout_impl=hp.hidden_dropout_impl)

    def init_params(self, rng: jax.Array, seq_len: int = 64) -> dict:
        r1, r2 = jax.random.split(rng)
        ids = jnp.zeros((1, seq_len), jnp.int32)
        return {
            "sent": self.sent_encoder.init(r1, ids, jnp.ones_like(ids))["params"],
            "context": self.context_encoder.init(r2, ids, jnp.ones_like(ids))["params"],
        }

    def _cls(self, enc, params, feats, deterministic=True, rng=None):
        kwargs = {}
        if not deterministic:
            kwargs = {"deterministic": False, "rngs": {"dropout": rng}}
        last, _ = enc.apply({"params": params}, feats["token_ids"],
                            feats["attn_mask"], **kwargs)
        return last[:, 0, :]

    def encode(self, params, feats, deterministic=True, rng=None):
        return self._cls(self.sent_encoder, params["sent"], feats,
                         deterministic, rng), None

    def train_loss(self, params, batch, rng, train: bool = True) -> jax.Array:
        q_rng, p_rng = jax.random.split(rng)
        q = self._cls(self.sent_encoder, params["sent"], batch["query"],
                      not train, q_rng)
        p = self._cls(self.context_encoder, params["context"], batch["pos"],
                      not train, p_rng)
        sims = jnp.einsum("qd,pd->qp", q, p, preferred_element_type=jnp.float32)
        b = sims.shape[0]
        # cross-entropy, reduction='sum', targets = diagonal
        logp = jax.nn.log_softmax(sims, axis=1)
        return -jnp.sum(logp[jnp.arange(b), jnp.arange(b)])
