"""Sentence-model (cosentbert/ictsentbert) and legacy ranking-eval tests."""
import json
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aspire_tpu.core.config import ModelHParams
from aspire_tpu.models.bert import BertConfig
from aspire_tpu.models.doc_models import build_model

CFG = BertConfig.tiny()


def feats(rng, b=4, t=16):
    return {
        "token_ids": jnp.asarray(rng.integers(5, 128, (b, t)).astype(np.int32)),
        "attn_mask": jnp.asarray(np.ones((b, t), np.int32)),
        "sent_ids": jnp.asarray(np.zeros((b, t), np.int32)),
        "abs_lens": jnp.asarray(np.ones(b, np.int32)),
    }


@pytest.mark.parametrize("name", ["cosentbert", "ictsentbert"])
def test_sent_models_train(rng, name):
    model = build_model(ModelHParams(model_name=name), CFG)
    params = model.init_params(jax.random.key(0))
    batch = {"query": feats(rng), "pos": feats(rng)}
    loss, grads = jax.value_and_grad(model.train_loss)(params, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(grads))


def test_ict_loss_matches_torch(rng):
    import torch
    model = build_model(ModelHParams(model_name="ictsentbert"), CFG)
    # oracle on the similarity matrix itself
    q = rng.normal(size=(5, 8)).astype(np.float32)
    p = rng.normal(size=(5, 8)).astype(np.float32)
    sims = q @ p.T
    want = float(torch.nn.CrossEntropyLoss(reduction="sum")(
        torch.tensor(sims), torch.arange(5)))
    logp = jax.nn.log_softmax(jnp.asarray(sims), axis=1)
    got = float(-jnp.sum(logp[jnp.arange(5), jnp.arange(5)]))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_legacy_ranking_eval(tmp_path, rng):
    from tests_evalds import make_eval_dataset
    from aspire_tpu.evaluation.ranking_eval import (
        eval_pool_ranking, print_pool_neighbours, ranked_pool_filename)
    from aspire_tpu.evaluation.datasets import EvalDataset
    WORDS = ["alpha", "beta", "gamma", "delta"]
    papers, anns = make_eval_dataset(tmp_path, rng, WORDS)
    # perfect ranking: relevant (first 2 cands) on top
    ranked = {q: [[c, 1.0 / (i + 1)] for i, c in enumerate(info["cands"])]
              for q, info in anns.items()}
    fname = ranked_pool_filename(str(tmp_path), "toy", "testmethod")
    with open(fname, "w") as f:
        json.dump(ranked, f)
    res = eval_pool_ranking(str(tmp_path), "toy", "testmethod")
    assert res["test"]["mean_av_precision"] == pytest.approx(1.0)
    ds = EvalDataset("toy", str(tmp_path))
    print_pool_neighbours(ds, ranked, str(tmp_path / "nn"))
    dump = (tmp_path / "nn" / "q0-neighbours.txt").read_text()
    assert "QUERY: q0" in dump and "RANK 0" in dump
