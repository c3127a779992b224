"""Multi-vector pair scoring / distance functions (the framework's math core).

TPU re-design of src/learning/facetid_models/pair_distances.py.  Every
function is jit/vmap/grad-safe with static shapes: documents arrive as
`MultiVec` (zero-padded `[batch, max_sents, dim]` embeddings + int lengths)
instead of the reference's `[batch, dim, max_sents]` tensors + Python length
lists, and all the per-example Python mask loops become broadcasted masks.

Train-time functions return positive "distances" (to be minimized inside a
triplet loss); test-time variants (`return_pair_sims=True`) return
similarities plus per-pair diagnostics, mirroring the reference contracts.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core.types import MultiVec, PAD_NEG, masked_2d_softmax
from .cdist import pairwise_l2
from .sinkhorn import sinkhorn_potentials, sinkhorn_cost


def _masked_neg_dists(query: MultiVec, cand: MultiVec,
                      cost: jax.Array | None = None) -> jax.Array:
    """-cdist(q, c) with -10e8 added at pad positions.

    Mirrors pair_distances.py:49-56: negative L2 distances, additive pad mask.
    cost: optional precomputed pairwise_l2 (callers that also feed the OT
    solver dedup the cdist).
    """
    if cost is None:
        cost = pairwise_l2(query.embed, cand.embed)
    return -cost + query.pair_pad_mask(cand)


def l2max_dist(query: MultiVec, cand: MultiVec, return_pair_sims: bool = False):
    """Single best sentence match: max over the masked -L2 matrix.

    Reference: allpair_masked_dist_l2max (pair_distances.py:138-186).
    Train -> positive distance f32[batch]; test -> (sims, pair_sims).
    """
    neg = _masked_neg_dists(query, cand)
    b = neg.shape[0]
    best = jnp.max(neg.reshape(b, -1), axis=1)
    if return_pair_sims:
        return best, neg
    return -best


def l2topk_dist(query: MultiVec, cand: MultiVec, k: int = 2, return_pair_sims: bool = False):
    """Top-k sentence matches summed (reference k=2).

    Reference: allpair_masked_dist_l2topk (pair_distances.py:295-345).
    """
    neg = _masked_neg_dists(query, cand)
    b = neg.shape[0]
    topk, _ = jax.lax.top_k(neg.reshape(b, -1), k)
    if return_pair_sims:
        return jnp.sum(topk, axis=1), neg
    return -jnp.sum(topk, axis=1)


def l2sup_dist(query: MultiVec, cand: MultiVec) -> jax.Array:
    """Distance of the pre-aligned sentence pair (tsAspire supervision).

    `cand.align` holds (query_sent_idx, cand_sent_idx) per example; indices are
    clipped to the (possibly truncated) valid lengths, then the L2 distance at
    that cell is returned.  No pad masking is needed -- the aligned cell is
    always valid after clipping.  Reference: allpair_masked_dist_l2sup
    (pair_distances.py:189-235).
    """
    qi = jnp.minimum(cand.align[:, 0], query.lens - 1)
    ci = jnp.minimum(cand.align[:, 1], cand.lens - 1)
    neg = -pairwise_l2(query.embed, cand.embed)
    b = neg.shape[0]
    picked = neg[jnp.arange(b), qi, ci]
    return -picked


def l2sup_weighted_dist(query: MultiVec, cand: MultiVec) -> jax.Array:
    """l2sup divided by the cross-doc matrix size ql*cl (for OT multitasking).

    Reference: allpair_masked_dist_l2sup_weighted (pair_distances.py:238-292).
    """
    qi = jnp.minimum(cand.align[:, 0], query.lens - 1)
    ci = jnp.minimum(cand.align[:, 1], cand.lens - 1)
    neg = -pairwise_l2(query.embed, cand.embed)
    b = neg.shape[0]
    picked = neg[jnp.arange(b), qi, ci]
    sizes = (query.lens * cand.lens).astype(neg.dtype)
    return -(picked / sizes)


def attention_dist(
    query: MultiVec,
    cand: MultiVec,
    temp: float = 1.0,
    return_pair_sims: bool = False,
):
    """Masked joint-2D-softmax attention distance (attAspire).

    Reference: AllPairMaskedAttention.compute_distance
    (pair_distances.py:95-135).  NOTE the reference does NOT pad-mask the
    distance matrix before the softmax here -- the masked_2d_softmax supplies
    the masking -- and train time weights *positive* distances.
    """
    neg = -pairwise_l2(query.embed, cand.embed)
    pair_sm = masked_2d_softmax(neg / temp, query.lens, cand.lens)
    if return_pair_sims:
        masked_sims = pair_sm * neg
        doc_sims = jnp.sum(masked_sims, axis=(1, 2))
        return doc_sims, (neg, pair_sm, masked_sims)
    masked_d = pair_sm * (-neg)
    return jnp.sum(masked_d, axis=(1, 2))


def ot_marginals(query: MultiVec, cand: MultiVec, temp: float = 1.0,
                 cost: jax.Array | None = None):
    """Marginal distributions over sentences for the OT solver.

    softmax over (max-similarity to the other doc) / temp, computed on the
    pad-masked -L2 matrix so pad sentences get ~zero mass
    (pair_distances.py:57-60).  Returns (a, b, masked_neg_dists).
    cost: optional precomputed unmasked pairwise_l2 (dedups the cdist when
    the caller also feeds the solver).
    """
    neg = _masked_neg_dists(query, cand, cost=cost)
    q_max = jnp.max(neg, axis=2)
    c_max = jnp.max(neg, axis=1)
    a = jax.nn.softmax(q_max / temp, axis=1)
    b = jax.nn.softmax(c_max / temp, axis=1)
    return a, b, neg


def wasserstein_dist(
    query: MultiVec,
    cand: MultiVec,
    blur: float = 0.05,
    scaling: float = 0.9,
    reach: float | None = None,
    temp: float = 1.0,
    return_pair_sims: bool = False,
    max_iters: int = 128,
    diameter: str = "global",
    solver: str = "xla",
    diameter_value: jax.Array | None = None,
):
    """Optimal-transport multi-match scoring (otAspire).

    Reference: AllPairMaskedWasserstein.compute_distance
    (pair_distances.py:14-92).  Train -> Sinkhorn OT cost (a distance,
    gradients flow through the final extrapolation step as in geomloss).
    Test -> transport plan recovered from the dual potentials and the
    plan-weighted similarity sum, plus diagnostics
    [q_distr, c_distr, pair_sims, plan, masked_sims].

    diameter: 'global' (whole-batch annealing start; reference training
    batches) or 'pair' (per-pair; reference evaluate.py 1x1 scoring --
    batched eval scores become chunking-invariant).
    solver: 'xla' (default; differentiable) or 'pallas' (the VMEM-resident
    batch-on-lanes kernel: ~1.4x the solve throughput on v5e; FORWARD-ONLY,
    balanced OT; supports both diameter modes -- the serving/rerank and
    eval-scoring paths).
    """
    cost = pairwise_l2(query.embed, cand.embed)
    a, b, neg = ot_marginals(query, cand, temp=temp, cost=cost)

    def _solve():
        if solver == "pallas":
            if reach is not None:
                raise ValueError("solver='pallas' supports balanced OT only "
                                 "(reach=None)")
            from .pallas_sinkhorn import sinkhorn_potentials_pallas
            return sinkhorn_potentials_pallas(
                a, query.embed, b, cand.embed, blur=blur, scaling=scaling,
                max_iters=max_iters, cost=cost, use_cost=True,
                diameter=diameter, diameter_value=diameter_value,
                interpret=jax.default_backend() != "tpu")
        return sinkhorn_potentials(
            a, query.embed, b, cand.embed,
            blur=blur, scaling=scaling, reach=reach, max_iters=max_iters,
            diameter=diameter, cost=cost, use_cost=True,
            diameter_value=diameter_value,
        )

    if not return_pair_sims:
        f, g = _solve()
        return sinkhorn_cost(a, f, b, g, blur=blur, reach=reach)

    # Test path: zero the pads multiplicatively (the reference flips its
    # additive mask into a binary one in place, pair_distances.py:64-66).
    binary = query.sent_mask()[:, :, None] * cand.sent_mask()[:, None, :]
    masked_neg = neg * binary
    f, g = _solve()
    outersum = (f[:, :, None] + g[:, None, :]) * binary
    exps = jnp.exp((outersum + masked_neg) / blur)
    plan = exps * (a[:, :, None] * b[:, None, :])
    masked_sims = plan * masked_neg
    w_dists = jnp.sum(masked_sims, axis=(1, 2))
    return w_dists, (a, b, masked_neg, plan, masked_sims)


def jointsm_dist(query: MultiVec, cand: MultiVec, return_pair_sims: bool = False):
    """Poly-encoder style joint-softmax alignment score.

    Reference: allpair_joint_sm_negscore (pair_distances.py:348-402).  Uses
    scaled dot-product similarities (not L2), a joint 2-D masked softmax, and
    symmetric aligned-rep dot scores; returns the negated summed score.
    """
    d = query.dim
    # HIGHEST: scoring contractions must not round to bf16 (see ops/cdist.py)
    hi = jax.lax.Precision.HIGHEST
    sims = jnp.einsum(
        "bqd,bcd->bqc", query.embed, cand.embed, preferred_element_type=jnp.float32,
        precision=hi,
    )
    pair_sm = masked_2d_softmax(sims / math.sqrt(d), query.lens, cand.lens)
    # cand reps aligned to each query sentence: [b, q, d]
    cand2query = jnp.einsum("bqc,bcd->bqd", pair_sm, cand.embed, precision=hi)
    # query reps aligned to each cand sentence: [b, c, d]
    query2cand = jnp.einsum("bqc,bqd->bcd", pair_sm, query.embed, precision=hi)
    q_scores = jnp.sum(query.embed * cand2query, axis=2)
    c_scores = jnp.sum(cand.embed * query2cand, axis=2)
    summed = jnp.sum(q_scores, axis=1) + jnp.sum(c_scores, axis=1)
    if return_pair_sims:
        return -summed, pair_sm
    return -summed


def get_dist_function(score_agg_type: str, hp=None):
    """Distance-function registry keyed by the reference's config names
    (disent_models.py:236-247)."""
    if score_agg_type in ("l2max", "l2lse"):
        return l2max_dist
    if score_agg_type == "l2top2":
        return l2topk_dist
    if score_agg_type == "l2wasserstein":
        blur = getattr(hp, "geoml_blur", 0.05) if hp is not None else 0.05
        scaling = getattr(hp, "geoml_scaling", 0.9) if hp is not None else 0.9
        reach = getattr(hp, "geoml_reach", None) if hp is not None else None
        temp = getattr(hp, "sent_sm_temp", 1.0) if hp is not None else 1.0

        def fn(query, cand, return_pair_sims=False):
            return wasserstein_dist(
                query, cand, blur=blur, scaling=scaling, reach=reach,
                temp=temp, return_pair_sims=return_pair_sims,
            )
        return fn
    if score_agg_type == "l2attention":
        temp = getattr(hp, "cdatt_sm_temp", 1.0) if hp is not None else 1.0

        def fn(query, cand, return_pair_sims=False):
            return attention_dist(query, cand, temp=temp, return_pair_sims=return_pair_sims)
        return fn
    if score_agg_type == "jointsm":
        return jointsm_dist
    raise ValueError(f"Unknown aggregation: {score_agg_type}")
