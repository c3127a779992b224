"""Fast-OT ranking equivalence, deep-pool chunking, NER eval model."""
import json
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aspire_tpu.core.types import MultiVec
from aspire_tpu.index.serve import ot_rerank
from aspire_tpu.models.bert import BertConfig
from aspire_tpu.models.encoders import ConSentEncoder
from aspire_tpu.evaluation.models import (
    AspireSimilarityModel, AspireNERSimilarityModel)


def test_fast_ot_preserves_ranking(rng):
    k, s, d = 24, 10, 32
    q = MultiVec(embed=jnp.asarray(rng.normal(size=(1, s, d)).astype(np.float32)),
                 lens=jnp.asarray([8]))
    cands = MultiVec(embed=jnp.asarray(rng.normal(size=(k, s, d)).astype(np.float32)),
                     lens=jnp.asarray(rng.integers(2, s + 1, k).astype(np.int32)))
    parity = np.asarray(ot_rerank(q, cands, temp=5000.0))
    fast = np.asarray(ot_rerank(q, cands, temp=5000.0, scaling=0.8, max_iters=64))
    # random candidates are near-ties, so deep ranks may swap; require the
    # top-2 exact, top-5 as a set, and near-perfect score correlation
    order_p = np.argsort(-parity)
    order_f = np.argsort(-fast)
    np.testing.assert_array_equal(order_p[:2], order_f[:2])
    assert len(set(order_p[:5]) & set(order_f[:5])) >= 4
    cc = np.corrcoef(parity, fast)[0, 1]
    assert cc > 0.99, cc


@pytest.fixture
def tiny_model(tmp_path, rng):
    from transformers import BertTokenizer
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "title",
             "alpha", "beta", "gamma", "delta"]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab))
    tok = BertTokenizer(str(tmp_path / "vocab.txt"))
    cfg = BertConfig.tiny()
    params = ConSentEncoder(cfg, max_sents=6).init(
        jax.random.key(0), *(np.zeros((1, 8), np.int32),) * 3)["params"]
    return cfg, params, tok


def test_deep_pool_chunking(tiny_model, rng, monkeypatch):
    cfg, params, tok = tiny_model
    m = AspireSimilarityModel(name="m", bert_config=cfg, params=params,
                              tokenizer=tok, agg="l2max", max_sents=6)
    monkeypatch.setattr(AspireSimilarityModel, "SCORE_CHUNKS", (16,))
    q = rng.normal(size=(4, cfg.hidden_size)).astype(np.float32)
    cands = [rng.normal(size=(int(rng.integers(1, 6)), cfg.hidden_size)).astype(np.float32)
             for _ in range(41)]  # 2 full chunks + remainder
    sims = m.get_similarities(q, cands)
    assert sims.shape == (41,)
    # chunked result equals single per-pair scoring
    singles = np.asarray([m.get_similarity(q, c) for c in cands])
    np.testing.assert_allclose(sims, singles, rtol=1e-4, atol=1e-4)


def test_ner_model_appends_entities(tiny_model):
    cfg, params, tok = tiny_model
    m = AspireNERSimilarityModel(name="m", bert_config=cfg, params=params,
                                 tokenizer=tok, agg="l2max", max_sents=6,
                                 encoding_type="sentence-entity")
    paper = {"TITLE": "title", "ABSTRACT": ["alpha beta", "gamma delta"],
             "ENTITIES": [["alpha"], ["delta", "gamma"]]}
    encs = m.encode([paper])
    # 2 sentences + 3 entity pseudo-sentences
    assert encs[0].shape[0] == 5
    plain = AspireSimilarityModel(name="p", bert_config=cfg, params=params,
                                  tokenizer=tok, agg="l2max", max_sents=6)
    encs_plain = plain.encode([paper])
    assert encs_plain[0].shape[0] == 2


def test_ner_model_encode_quantized_includes_entities(tiny_model):
    """The int8 index path must see the entity pseudo-sentences too -- the
    inherited encode_quantized would quantize the 2 sentence rows only and
    int8/float indexes would disagree for NER models."""
    cfg, params, tok = tiny_model
    m = AspireNERSimilarityModel(name="m", bert_config=cfg, params=params,
                                 tokenizer=tok, agg="l2max", max_sents=6,
                                 encoding_type="sentence-entity")
    paper = {"TITLE": "title", "ABSTRACT": ["alpha beta", "gamma delta"],
             "ENTITIES": [["alpha"], ["delta", "gamma"]]}
    (xi, sc), = m.encode_quantized([paper])
    enc, = m.encode([paper])
    assert xi.shape[0] == enc.shape[0] == 5      # 2 sents + 3 entities
    np.testing.assert_allclose(xi.astype(np.float32) * sc[:, None], enc,
                               atol=np.abs(enc).max() / 100)


def test_unbalanced_sinkhorn_reach(rng):
    """reach (unbalanced OT) produces finite potentials/cost differing from
    the balanced solve (pair_distances geoml_reach plumbing)."""
    from aspire_tpu.ops.sinkhorn import sinkhorn_potentials, sinkhorn_cost
    a = rng.random((2, 5)).astype(np.float32); a /= a.sum(1, keepdims=True)
    b = rng.random((2, 6)).astype(np.float32); b /= b.sum(1, keepdims=True)
    x = rng.normal(size=(2, 5, 8)).astype(np.float32)
    y = rng.normal(size=(2, 6, 8)).astype(np.float32)
    fb, gb_ = sinkhorn_potentials(a, x, b, y)
    cost_bal = np.asarray(sinkhorn_cost(jnp.asarray(a), fb, jnp.asarray(b), gb_))
    fu, gu = sinkhorn_potentials(a, x, b, y, reach=1.0)
    cost_unb = np.asarray(sinkhorn_cost(jnp.asarray(a), fu, jnp.asarray(b), gu,
                                        reach=1.0))
    assert np.isfinite(cost_unb).all()
    # unbalanced relaxes the marginals -> strictly cheaper transport
    assert (cost_unb < cost_bal).all(), (cost_unb, cost_bal)


def test_trained_sent_model_eval(tmp_path, rng, tiny_model):
    """cosentbert eval path: per-sentence CLS reps + cosine max-sim."""
    from aspire_tpu.evaluation.models import TrainedSentSimilarityModel
    from aspire_tpu.models.bert import BertModel, BertConfig
    cfg, _, tok = tiny_model
    enc = BertModel(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = enc.init(jax.random.key(2), ids, jnp.ones_like(ids))["params"]
    m = TrainedSentSimilarityModel(name="cosentbert", bert_config=cfg,
                                   params=params, tokenizer=tok)
    papers = [{"TITLE": "t", "ABSTRACT": ["alpha beta", "gamma delta", "alpha"]},
              {"TITLE": "t", "ABSTRACT": ["alpha beta"]}]
    encs = m.encode(papers)
    assert encs[0].shape[0] == 3 and encs[1].shape[0] == 1
    # identical sentence "alpha beta" -> cosine max-sim 1.0
    sim = m.get_similarity(encs[0], encs[1])
    assert sim == pytest.approx(1.0, abs=1e-5)


def test_jointsm_eval_agg(tiny_model, rng):
    cfg, params, tok = tiny_model
    from aspire_tpu.evaluation.models import AspireSimilarityModel
    m = AspireSimilarityModel(name="poly", bert_config=cfg, params=params,
                              tokenizer=tok, agg="jointsm", max_sents=6)
    q = rng.normal(size=(3, cfg.hidden_size)).astype(np.float32)
    cands = [rng.normal(size=(2, cfg.hidden_size)).astype(np.float32)
             for _ in range(4)]
    sims = m.get_similarities(q, cands)
    assert sims.shape == (4,) and np.isfinite(sims).all()


def test_simcse_eval_model(tmp_path, rng):
    """supsimcse/unsupsimcse eval path (reference utils/models.py:322-357):
    EACH abstract sentence is encoded to its POOLER output (tanh(dense(CLS)),
    not plain CLS), reps split per abstract, max-cosine ranking -- oracle:
    torch pooler_output on identical token ids."""
    import torch
    import transformers
    from aspire_tpu.evaluation.models import get_model
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "title",
             "alpha", "beta", "gamma", "delta"]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab))
    hf_tok = transformers.BertTokenizer(str(tmp_path / "vocab.txt"))
    hf_cfg = transformers.BertConfig(
        vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2)
    torch.manual_seed(7)
    hf = transformers.BertModel(hf_cfg, add_pooling_layer=True).eval()
    mdir = tmp_path / "simcse"
    hf.save_pretrained(mdir)
    hf_tok.save_pretrained(mdir)

    m = get_model("supsimcse", weights_dir=str(mdir))
    papers = [{"TITLE": "t", "ABSTRACT": ["alpha beta gamma", "delta alpha"]},
              {"TITLE": "t", "ABSTRACT": ["beta beta"]}]
    encs = m.encode(papers)
    # per-abstract SENTENCE-set reps (2 sents, 1 sent), pooler width
    assert encs[0].shape == (2, 32) and encs[1].shape == (1, 32)
    sents = ["alpha beta gamma", "delta alpha", "beta beta"]
    enc = hf_tok(sents, return_tensors="pt", padding=True)
    with torch.no_grad():
        want = hf(**enc).pooler_output.numpy()
    got = np.concatenate(encs)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)
    # NOT the CLS rep (the round-4 deviation this closes)
    with torch.no_grad():
        cls = hf(**enc).last_hidden_state[:, 0, :].numpy()
    assert not np.allclose(got, cls, atol=1e-3)
    assert m.get_similarity(encs[0], encs[0]) == pytest.approx(1.0, abs=1e-5)
