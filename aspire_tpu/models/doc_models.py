"""Document-similarity model zoo: encoders + training losses + scoring.

TPU re-design of src/learning/facetid_models/disent_models.py.  One class per
reference model family, all sharing the same functional skeleton:

  * `init_params(rng)`         -- build the Flax param tree
  * `encode(params, feats)`    -- features -> (doc_cls, MultiVec sentence reps)
  * `train_loss(params, batch, rng)` -- triplet losses with in-batch negatives
  * `score_reps(q, c)`         -- test-time similarity from cached reps
                                  (reference caching_score, disent_models.py:256-342)

Model registry names match main_fsim.py:91-99:
  cospecter      -> CLS bi-encoder, scalar layer mix, L2 triplet
  miswordbienc   -> contextual sentence reps, pluggable distance triplet
  sbalisentbienc -> + pre-aligned sentence supervision (tsAspire / ts+otAspire)
  miswordpolyenc -> poly-encoder joint-softmax distance

Training batches are pytrees of static-shape arrays (see text/tokenize.py);
losses mirror the reference exactly: TripletMarginWithDistanceLoss(margin=1,
reduction='sum') over distances, torch TripletMarginLoss(margin=1, p=2) for
CLS reps, in-batch negatives via permutation of positives
(disent_models.py:447-467,802-837).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..core.config import ModelHParams
from ..core.types import MultiVec
from ..ops.distances import (
    get_dist_function, l2sup_dist, l2sup_weighted_dist,
)
from ..ops.cdist import pairwise_l2
from .bert import BertConfig
from .encoders import ConSentEncoder, BiEncoder


def _triplet_margin(d_ap: jax.Array, d_an: jax.Array, margin: float = 1.0) -> jax.Array:
    """sum(relu(d(a,p) - d(a,n) + margin)) -- torch TripletMarginWithDistanceLoss."""
    return jnp.sum(jnp.maximum(d_ap - d_an + margin, 0.0))


def _cls_l2_triplet(q: jax.Array, p: jax.Array, n: jax.Array, margin: float = 1.0) -> jax.Array:
    """torch TripletMarginLoss(margin=1, p=2, reduction='sum') on CLS reps."""
    d_ap = jnp.linalg.norm(q - p + 1e-6, axis=-1)
    d_an = jnp.linalg.norm(q - n + 1e-6, axis=-1)
    return jnp.sum(jnp.maximum(d_ap - d_an + margin, 0.0))


def _svalue_l1(q_sents: MultiVec, p_sents: MultiVec) -> jax.Array:
    """L1 norm of singular values of the cross-doc similarity matrix
    (sparsity regularizer, disent_models.py:459-467)."""
    pair_sims = -pairwise_l2(q_sents.embed, p_sents.embed)
    svals = jnp.linalg.svd(pair_sims, compute_uv=False)
    return jnp.sum(jnp.abs(svals))


def _feats_args(feats: dict) -> tuple:
    return (feats["token_ids"], feats["attn_mask"], feats["sent_ids"])


class ConSentDocModel:
    """Shared skeleton for the contextual-sentence models
    (miswordbienc / sbalisentbienc / miswordpolyenc)."""

    def __init__(self, hp: ModelHParams, bert_config: BertConfig,
                 dtype: Any = jnp.float32):
        self.hp = hp
        self.bert_config = bert_config
        self.encoder = ConSentEncoder(bert_config, max_sents=hp.max_sents,
                                      dtype=dtype,
                                      attention_impl=hp.attention_impl,
                                      hidden_dropout_impl=hp.hidden_dropout_impl,
                                      ffn_impl=hp.ffn_impl)
        # get_dist_function aliases l2lse -> l2max itself (the reference's
        # caching_score does the same remap, disent_models.py:294-297)
        self.dist_fn = get_dist_function(hp.score_aggregation, hp)
        if hp.model_name == "miswordpolyenc":
            self.dist_fn = get_dist_function("jointsm", hp)
        self.sent_loss_prop = float(hp.sent_loss_prop)
        self.abs_loss_prop = float(hp.abs_loss_prop)
        self.sentsup_loss_prop = float(hp.sentsup_loss_prop)
        self.cd_svalue_l1_prop = float(hp.cd_svalue_l1_prop)
        # SCORE-time proportions are not the training mix: the base
        # WordSentAlignBiEnc pins sent=1.0 / abs=0.0 at __init__
        # (disent_models.py:253-254) regardless of hparams; subclasses
        # override below per their reference counterparts.
        self.score_sent_prop = 1.0
        self.score_abs_prop = 0.0

    # ---- params ----
    def init_params(self, rng: jax.Array, seq_len: int = 64) -> dict:
        fb = {
            "token_ids": jnp.zeros((1, seq_len), jnp.int32),
            "attn_mask": jnp.ones((1, seq_len), jnp.int32),
            "sent_ids": jnp.zeros((1, seq_len), jnp.int32),
        }
        return self.encoder.init(rng, *_feats_args(fb))["params"]

    # ---- encode ----
    def encode(self, params: dict, feats: dict,
               deterministic: bool = True, rng: jax.Array | None = None):
        """-> (doc_cls f32[b, h], MultiVec sentence reps)."""
        kwargs = {}
        if not deterministic:
            kwargs = {"deterministic": False, "rngs": {"dropout": rng}}
        cls, sents = self.encoder.apply({"params": params}, *_feats_args(feats), **kwargs)
        return cls, MultiVec(embed=sents, lens=feats["abs_lens"])

    # ---- test-time scoring from cached reps ----
    def score_reps(self, q_cls, q_sents: MultiVec, c_cls, c_sents: MultiVec):
        """Similarity scores (higher = more similar), reference caching_score
        semantics (disent_models.py:294-307): sent-level sims scaled by the
        score-time sentence proportion plus optional CLS-distance term."""
        sims, pair = self.dist_fn(q_sents, c_sents, return_pair_sims=True)
        if self.hp.model_name == "miswordpolyenc":
            # WordSentAlignPolyEnc.caching_score negates the joint-sm
            # negscore and applies NO loss-prop scaling
            # (disent_models.py:902-906); jointsm_dist returns the negscore
            return -sims, pair
        scores = self.score_sent_prop * sims
        if self.score_abs_prop > 0.0:
            doc_sims = -jnp.linalg.norm(q_cls - c_cls + 1e-6, axis=-1)
            scores = scores + self.score_abs_prop * doc_sims
        return scores, pair

    # ---- training ----
    def train_loss(self, params: dict, batch: dict, rng: jax.Array,
                   train: bool = True) -> jax.Array:
        """Triplet loss over (query, pos, neg-or-in-batch-negatives).

        batch: {'query': feats, 'pos': feats [+ 'align' i32[b,2]],
                optional 'neg': feats} (dev sets carry explicit negatives).
        """
        perm_rng, q_rng, p_rng, n_rng = jax.random.split(rng, 4)
        q_cls, q_sents = self.encode(params, batch["query"],
                                     deterministic=not train, rng=q_rng)
        p_cls, p_sents = self.encode(params, batch["pos"],
                                     deterministic=not train, rng=p_rng)
        if "neg" in batch:
            n_cls, n_sents = self.encode(params, batch["neg"],
                                         deterministic=not train, rng=n_rng)
            perm = None
        else:
            b = q_cls.shape[0]
            perm = jax.random.permutation(perm_rng, b)
            n_cls = p_cls[perm]
            n_sents = MultiVec(embed=p_sents.embed[perm], lens=p_sents.lens[perm])
        return self._combine_losses(batch, q_cls, q_sents, p_cls, p_sents,
                                    n_cls, n_sents, perm)

    def _combine_losses(self, batch, q_cls, q_sents, p_cls, p_sents,
                        n_cls, n_sents, perm):
        loss = _triplet_margin(self.dist_fn(q_sents, p_sents),
                               self.dist_fn(q_sents, n_sents))
        if self.cd_svalue_l1_prop > 0 and perm is not None:
            loss = loss + self.cd_svalue_l1_prop * _svalue_l1(q_sents, p_sents)
        return loss

    def train_loss_grouped(self, params: dict, superbatch: dict, rng: jax.Array,
                           train: bool = True):
        """Fused gradient accumulation: one wide encode + vmapped group losses.

        superbatch: pytree with leading [n_micro, micro_batch, ...] axes (the
        same layout the scan-accumulation step consumes).  Encodes all
        n_micro * micro examples as ONE batch -- n_micro x the MXU work per
        launch vs the reference's sequential microbatches
        (trainer.py:139-153) -- then applies each microbatch's loss (with its
        own group-local in-batch-negative permutation, derived from the same
        per-micro key split as the scan path) and sums.  The gradient of the
        sum equals the scan's summed microbatch gradients exactly: same
        group structure, same reductions, bitwise-matching permutations.
        Dropout streams differ from the scan path (one wide stream instead
        of per-micro streams) -- distributionally equivalent.

        Returns (summed loss, per-group losses [n_micro]).
        """
        leaves = jax.tree_util.tree_leaves(superbatch)
        n_micro, gb = leaves[0].shape[:2]
        keys = jax.random.split(rng, n_micro)  # scan-identical per-micro keys
        # per-micro (perm, q, p, n) rngs exactly as train_loss splits them
        sub = jax.vmap(lambda k: jax.random.split(k, 4))(keys)  # [n_micro, 4]
        flat = jax.tree_util.tree_map(
            lambda x: x.reshape((n_micro * gb,) + x.shape[2:]), superbatch)
        det = not train
        q_cls, q_sents = self.encode(params, flat["query"], deterministic=det,
                                     rng=sub[0, 1])
        p_cls, p_sents = self.encode(params, flat["pos"], deterministic=det,
                                     rng=sub[0, 2])
        has_neg = "neg" in superbatch
        if has_neg:
            n_cls, n_sents = self.encode(params, flat["neg"], deterministic=det,
                                         rng=sub[0, 3])
        regroup = lambda x: x.reshape((n_micro, gb) + x.shape[1:])

        def group_loss(batch_g, perm_key, qc, qe, ql, pc, pe, pl, *neg):
            q_s = MultiVec(embed=qe, lens=ql)
            p_s = MultiVec(embed=pe, lens=pl)
            if has_neg:
                nc, ne, nl = neg
                n_s = MultiVec(embed=ne, lens=nl)
                perm = None
            else:
                perm = jax.random.permutation(perm_key, gb)
                nc = pc[perm]
                n_s = MultiVec(embed=pe[perm], lens=pl[perm])
            return self._combine_losses(batch_g, qc, q_s, pc, p_s, nc, n_s, perm)

        args = [superbatch, sub[:, 0], regroup(q_cls), regroup(q_sents.embed),
                regroup(q_sents.lens), regroup(p_cls), regroup(p_sents.embed),
                regroup(p_sents.lens)]
        if has_neg:
            args += [regroup(n_cls), regroup(n_sents.embed), regroup(n_sents.lens)]
        losses = jax.vmap(group_loss)(*args)
        return jnp.sum(losses), losses


class WordSentAlignModel(ConSentDocModel):
    """miswordbienc / miswordpolyenc (disent_models.py:208-535,840-925)."""


class WordSentAbsAlignModel(ConSentDocModel):
    """miswordabsbienc: sentence-distance triplet + abstract-CLS triplet with
    an optional L1 sparsity penalty on the cross-doc similarity matrix
    (WordSentAbsAlignBiEnc, disent_models.py:538-660)."""

    def __init__(self, hp: ModelHParams, bert_config: BertConfig,
                 dtype: Any = jnp.float32):
        super().__init__(hp, bert_config, dtype)
        # this family scores with its hparam proportions
        # (WordSentAbsAlignBiEnc.__init__, disent_models.py:583-584)
        self.score_sent_prop = float(hp.sent_loss_prop)
        self.score_abs_prop = float(hp.abs_loss_prop)

    def _combine_losses(self, batch, q_cls, q_sents, p_cls, p_sents,
                        n_cls, n_sents, perm):
        loss = self.sent_loss_prop * _triplet_margin(
            self.dist_fn(q_sents, p_sents), self.dist_fn(q_sents, n_sents))
        loss = loss + self.abs_loss_prop * _cls_l2_triplet(q_cls, p_cls, n_cls)
        cd_l1 = float(self.hp.cd_l1_prop)
        if cd_l1 > 0 and perm is not None:
            pair_sims = -pairwise_l2(q_sents.embed, p_sents.embed)
            b = pair_sims.shape[0]
            sims_norm = jnp.sum(jnp.abs(pair_sims.reshape(b, -1)), axis=1)
            loss = loss + cd_l1 * jnp.sum(sims_norm)
        return loss


class WordSentAbsSupAlignModel(ConSentDocModel):
    """sbalisentbienc: tsAspire/ts+otAspire with pre-aligned sentence
    supervision (disent_models.py:663-837)."""

    def __init__(self, hp: ModelHParams, bert_config: BertConfig,
                 dtype: Any = jnp.float32):
        super().__init__(hp, bert_config, dtype)
        self.sup_fn = l2sup_weighted_dist if hp.weighted_sup else l2sup_dist
        # caching_score uses max(sent, sentsup) for this family
        # (disent_models.py:299-304, 714-716) + the hparam abs term
        self.score_sent_prop = max(float(hp.sent_loss_prop),
                                   float(hp.sentsup_loss_prop))
        self.score_abs_prop = float(hp.abs_loss_prop)

    def _combine_losses(self, batch, q_cls, q_sents, p_cls, p_sents,
                        n_cls, n_sents, perm):
        if perm is None:
            # Dev set: "predictions" not pre-alignments (disent_models.py:796-801).
            loss = _triplet_margin(self.dist_fn(q_sents, p_sents),
                                   self.dist_fn(q_sents, n_sents))
            if self.abs_loss_prop > 0:
                loss = loss + self.abs_loss_prop * _cls_l2_triplet(q_cls, p_cls, n_cls)
            return loss
        pos_align = batch["pos"]["align"]
        neg_align = pos_align[perm]
        p_ali = MultiVec(embed=p_sents.embed, lens=p_sents.lens, align=pos_align)
        n_ali = MultiVec(embed=n_sents.embed, lens=n_sents.lens, align=neg_align)
        loss = self.sentsup_loss_prop * _triplet_margin(
            self.sup_fn(q_sents, p_ali), self.sup_fn(q_sents, n_ali))
        if self.sent_loss_prop > 0:
            loss = loss + self.sent_loss_prop * _triplet_margin(
                self.dist_fn(q_sents, p_sents), self.dist_fn(q_sents, n_sents))
        if self.abs_loss_prop > 0:
            loss = loss + self.abs_loss_prop * _cls_l2_triplet(q_cls, p_cls, n_cls)
        if self.cd_svalue_l1_prop > 0:
            loss = loss + self.cd_svalue_l1_prop * _svalue_l1(q_sents, p_sents)
        return loss


class SpecterDocModel:
    """cospecter: CLS bi-encoder with scalar layer mix (disent_models.py:24-205)."""

    def __init__(self, hp: ModelHParams, bert_config: BertConfig,
                 dtype: Any = jnp.float32):
        self.hp = hp
        self.bert_config = bert_config
        self.encoder = BiEncoder(bert_config, dtype=dtype,
                                 attention_impl=hp.attention_impl,
                                 hidden_dropout_impl=hp.hidden_dropout_impl,
                                 ffn_impl=hp.ffn_impl)

    def init_params(self, rng: jax.Array, seq_len: int = 64) -> dict:
        fb = {
            "token_ids": jnp.zeros((1, seq_len), jnp.int32),
            "attn_mask": jnp.ones((1, seq_len), jnp.int32),
        }
        return self.encoder.init(rng, fb["token_ids"], fb["attn_mask"])["params"]

    def encode(self, params: dict, feats: dict,
               deterministic: bool = True, rng: jax.Array | None = None):
        kwargs = {}
        if not deterministic:
            kwargs = {"deterministic": False, "rngs": {"dropout": rng}}
        cls = self.encoder.apply({"params": params}, feats["token_ids"],
                                 feats["attn_mask"], **kwargs)
        return cls, None

    def score_reps(self, q_cls, q_sents, c_cls, c_sents):
        """-L2 distance between CLS reps (disent_models.py:76)."""
        scores = -jnp.linalg.norm(q_cls - c_cls, axis=-1)
        return scores, scores

    def train_loss(self, params: dict, batch: dict, rng: jax.Array,
                   train: bool = True) -> jax.Array:
        perm_rng, q_rng, p_rng, n_rng = jax.random.split(rng, 4)
        q_cls, _ = self.encode(params, batch["query"], deterministic=not train, rng=q_rng)
        p_cls, _ = self.encode(params, batch["pos"], deterministic=not train, rng=p_rng)
        if "neg" in batch:
            n_cls, _ = self.encode(params, batch["neg"], deterministic=not train, rng=n_rng)
        else:
            perm = jax.random.permutation(perm_rng, q_cls.shape[0])
            n_cls = p_cls[perm]
        return _cls_l2_triplet(q_cls, p_cls, n_cls)

    def train_loss_grouped(self, params: dict, superbatch: dict, rng: jax.Array,
                           train: bool = True):
        """Fused accumulation for the CLS bi-encoder (see
        ConSentDocModel.train_loss_grouped)."""
        leaves = jax.tree_util.tree_leaves(superbatch)
        n_micro, gb = leaves[0].shape[:2]
        keys = jax.random.split(rng, n_micro)
        sub = jax.vmap(lambda k: jax.random.split(k, 4))(keys)
        flat = jax.tree_util.tree_map(
            lambda x: x.reshape((n_micro * gb,) + x.shape[2:]), superbatch)
        det = not train
        q_cls, _ = self.encode(params, flat["query"], deterministic=det, rng=sub[0, 1])
        p_cls, _ = self.encode(params, flat["pos"], deterministic=det, rng=sub[0, 2])
        has_neg = "neg" in superbatch
        if has_neg:
            n_cls, _ = self.encode(params, flat["neg"], deterministic=det, rng=sub[0, 3])
        regroup = lambda x: x.reshape((n_micro, gb) + x.shape[1:])

        def group_loss(perm_key, qc, pc, *neg):
            if has_neg:
                nc = neg[0]
            else:
                nc = pc[jax.random.permutation(perm_key, gb)]
            return _cls_l2_triplet(qc, pc, nc)

        args = [sub[:, 0], regroup(q_cls), regroup(p_cls)]
        if has_neg:
            args.append(regroup(n_cls))
        losses = jax.vmap(group_loss)(*args)
        return jnp.sum(losses), losses


def _sent_models():
    from .sent_models import SentTripleModel, ICTModel
    return {"cosentbert": SentTripleModel, "ictsentbert": ICTModel}


MODEL_REGISTRY = {
    "cospecter": SpecterDocModel,
    "miswordbienc": WordSentAlignModel,
    "miswordabsbienc": WordSentAbsAlignModel,
    "miswordpolyenc": WordSentAlignModel,
    "sbalisentbienc": WordSentAbsSupAlignModel,
}


def build_model(hp: ModelHParams, bert_config: BertConfig, dtype: Any = jnp.float32):
    """Model factory keyed by the reference registries (main_fsim.py:91-99,
    main_sentsim.py -- cosentbert/ictsentbert included)."""
    registry = {**MODEL_REGISTRY, **_sent_models()}
    try:
        cls = registry[hp.model_name]
    except KeyError:
        raise ValueError(f"Unknown model: {hp.model_name}") from None
    return cls(hp, bert_config, dtype)
