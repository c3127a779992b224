"""Model-zoo tests: loss finiteness/gradients, scoring semantics."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aspire_tpu.core.config import ModelHParams
from aspire_tpu.models.bert import BertConfig
from aspire_tpu.models.doc_models import build_model, _cls_l2_triplet

CFG = BertConfig.tiny()


def make_feats(rng, b=3, t=24, smax=4, with_align=False):
    f = {
        "token_ids": jnp.asarray(rng.integers(5, 128, size=(b, t)).astype(np.int32)),
        "attn_mask": jnp.asarray(np.ones((b, t), np.int32)),
        "sent_ids": jnp.asarray(np.clip(rng.integers(-1, smax, size=(b, t)), -1, smax - 1).astype(np.int32)),
        "abs_lens": jnp.asarray(rng.integers(1, smax + 1, size=b).astype(np.int32)),
    }
    if with_align:
        f["align"] = jnp.asarray(rng.integers(0, smax, size=(b, 2)).astype(np.int32))
    return f


def hp_for(name, **kw):
    base = dict(model_name=name, max_sents=4)
    base.update(kw)
    return ModelHParams(**base)


@pytest.mark.parametrize("name,kw", [
    ("cospecter", {}),
    ("miswordbienc", {"score_aggregation": "l2max"}),
    ("miswordbienc", {"score_aggregation": "l2wasserstein", "sent_sm_temp": 5000.0}),
    ("miswordbienc", {"score_aggregation": "l2attention"}),
    ("miswordpolyenc", {"score_aggregation": "jointsm"}),
    ("sbalisentbienc", {"score_aggregation": "l2lse", "sentsup_loss_prop": 1.0,
                        "sent_loss_prop": 0.0}),
    ("sbalisentbienc", {"score_aggregation": "l2wasserstein", "sentsup_loss_prop": 1.0,
                        "sent_loss_prop": 0.5, "abs_loss_prop": 0.1}),
])
def test_train_loss_and_grad(rng, name, kw):
    hp = hp_for(name, **kw)
    model = build_model(hp, CFG)
    params = model.init_params(jax.random.key(0))
    batch = {
        "query": make_feats(rng),
        "pos": make_feats(rng, with_align=(name == "sbalisentbienc")),
    }
    key = jax.random.key(1)
    loss, grads = jax.value_and_grad(model.train_loss)(params, batch, key)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    gnorm = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert gnorm > 0.0


def test_dev_loss_with_explicit_negatives(rng):
    hp = hp_for("sbalisentbienc", score_aggregation="l2lse", sentsup_loss_prop=1.0)
    model = build_model(hp, CFG)
    params = model.init_params(jax.random.key(0))
    batch = {
        "query": make_feats(rng),
        "pos": make_feats(rng, with_align=True),
        "neg": make_feats(rng),
    }
    loss = model.train_loss(params, batch, jax.random.key(1), train=False)
    assert np.isfinite(float(loss))


def test_score_reps_l2max_semantics(rng):
    hp = hp_for("miswordbienc", score_aggregation="l2max")
    model = build_model(hp, CFG)
    params = model.init_params(jax.random.key(0))
    q = make_feats(rng)
    c = make_feats(rng)
    q_cls, q_sents = model.encode(params, q)
    c_cls, c_sents = model.encode(params, c)
    scores, pair = model.score_reps(q_cls, q_sents, c_cls, c_sents)
    assert scores.shape == (3,)
    # identical docs score 0 under l2max (best distance 0)
    s_same, _ = model.score_reps(q_cls, q_sents, q_cls, q_sents)
    np.testing.assert_allclose(np.asarray(s_same), 0.0, atol=1e-4)


def test_cls_triplet_matches_torch(rng):
    import torch
    q = rng.normal(size=(4, 16)).astype(np.float32)
    p = rng.normal(size=(4, 16)).astype(np.float32)
    n = rng.normal(size=(4, 16)).astype(np.float32)
    got = float(_cls_l2_triplet(jnp.asarray(q), jnp.asarray(p), jnp.asarray(n)))
    crit = torch.nn.TripletMarginLoss(margin=1, p=2, reduction="sum")
    want = float(crit(torch.tensor(q), torch.tensor(p), torch.tensor(n)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_train_loss_bf16_compute(rng):
    """Mixed precision (bf16 activations, f32 params): loss and grads stay
    finite and f32, and the loss lands near the f32-compute value."""
    hp = hp_for("sbalisentbienc", score_aggregation="l2wasserstein",
                sentsup_loss_prop=1.0, sent_loss_prop=0.5)
    batch = {"query": make_feats(rng), "pos": make_feats(rng, with_align=True)}
    losses = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        model = build_model(hp, CFG, dtype=dtype)
        params = model.init_params(jax.random.key(0))
        loss, grads = jax.value_and_grad(model.train_loss)(
            params, batch, jax.random.key(1))
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert all(l.dtype == jnp.float32 for l in leaves)
        losses[dtype] = float(loss)
    assert np.isfinite(losses[jnp.bfloat16])
    assert abs(losses[jnp.bfloat16] - losses[jnp.float32]) < (
        0.05 * abs(losses[jnp.float32]) + 0.05)


@pytest.mark.parametrize("name,kw", [
    ("cospecter", {}),
    ("miswordbienc", {"score_aggregation": "l2wasserstein", "sent_sm_temp": 5000.0}),
    ("sbalisentbienc", {"score_aggregation": "l2wasserstein",
                        "sentsup_loss_prop": 1.0, "sent_loss_prop": 0.5,
                        "abs_loss_prop": 0.1}),
])
def test_fused_accum_matches_scan(rng, name, kw):
    """train_loss_grouped must reproduce the scan path's summed loss and
    gradients exactly (deterministic mode isolates the permutation/grouping
    semantics from dropout-stream differences)."""
    hp = hp_for(name, **kw)
    model = build_model(hp, CFG)
    params = model.init_params(jax.random.key(0))
    n_micro, gb = 3, 4
    with_align = name == "sbalisentbienc"

    def stack(feat_fn):
        micros = [feat_fn() for _ in range(n_micro)]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *micros)

    superbatch = {
        "query": stack(lambda: make_feats(rng, b=gb)),
        "pos": stack(lambda: make_feats(rng, b=gb, with_align=with_align)),
    }
    key = jax.random.key(7)

    # scan-path reference: sum of per-micro losses/grads with the same keys
    keys = jax.random.split(key, n_micro)
    ref_loss, ref_grads = 0.0, None
    for i in range(n_micro):
        batch_i = jax.tree_util.tree_map(lambda x: x[i], superbatch)
        li, gi = jax.value_and_grad(model.train_loss)(
            params, batch_i, keys[i], False)
        ref_loss += float(li)
        ref_grads = gi if ref_grads is None else jax.tree_util.tree_map(
            jnp.add, ref_grads, gi)

    (total, losses), grads = jax.value_and_grad(
        model.train_loss_grouped, has_aux=True)(params, superbatch, key, False)
    assert losses.shape == (n_micro,)
    np.testing.assert_allclose(float(total), ref_loss, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(grads),
                    jax.tree_util.tree_leaves(ref_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_score_reps_props_pinned_for_bienc(rng):
    """miswordbienc scores with sent prop 1.0 / abs 0.0 regardless of the
    training hparams (reference hardcodes them at __init__,
    disent_models.py:253-254): sent_loss_prop=0 must NOT zero the scores."""
    hp = hp_for("miswordbienc", score_aggregation="l2max", sent_loss_prop=0.0)
    model = build_model(hp, CFG)
    params = model.init_params(jax.random.key(0))
    q_cls, q_sents = model.encode(params, make_feats(rng))
    c_cls, c_sents = model.encode(params, make_feats(rng))
    scores, _ = model.score_reps(q_cls, q_sents, c_cls, c_sents)
    assert float(np.abs(np.asarray(scores)).min()) > 0.0
    # and equals the raw l2max sims (prop exactly 1, no abs term)
    from aspire_tpu.ops.distances import l2max_dist
    raw, _ = l2max_dist(q_sents, c_sents, return_pair_sims=True)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(raw), rtol=1e-6)


def test_score_reps_polyenc_sign(rng):
    """miswordpolyenc similarity = -jointsm negscore with NO prop scaling
    (WordSentAlignPolyEnc.caching_score, disent_models.py:902-906): a doc
    must score ITSELF at least as high as a random other doc."""
    hp = hp_for("miswordpolyenc", score_aggregation="l2max",
                sent_loss_prop=0.25)
    model = build_model(hp, CFG)
    params = model.init_params(jax.random.key(0))
    q_cls, q_sents = model.encode(params, make_feats(rng))
    c_cls, c_sents = model.encode(params, make_feats(rng))
    from aspire_tpu.ops.distances import jointsm_dist
    neg, _ = jointsm_dist(q_sents, c_sents, return_pair_sims=True)
    scores, _ = model.score_reps(q_cls, q_sents, c_cls, c_sents)
    np.testing.assert_allclose(np.asarray(scores), -np.asarray(neg), rtol=1e-6)
    s_self, _ = model.score_reps(q_cls, q_sents, q_cls, q_sents)
    assert (np.asarray(s_self) >= np.asarray(scores) - 1e-5).all()
