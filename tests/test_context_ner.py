"""Contextual entity-span eval models (AspireContextNER equivalents).

Oracle checks: an entity's rep must equal the mean of ITS token states taken
from the same BERT forward that produced the sentence reps (reference
AspireConSenContextual, src/evaluation/utils/models.py:413-507), and the
span bookkeeping must honor the find-sublist + truncation contract
(AspireContextNER._get_ner_token_idxs, :649-697).
"""
import numpy as np
import pytest
from transformers import BertTokenizer

import jax
import jax.numpy as jnp

from aspire_tpu.models.bert import BertConfig, BertModel
from aspire_tpu.models.encoders import ConSentSpanEncoder, span_pool
from aspire_tpu.text.tokenize import (find_sublist_range, ner_token_spans,
                                      spans_to_mask, prepare_abstracts)
from aspire_tpu.evaluation.models import AspireContextNERSimilarityModel

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "title"] + WORDS
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(vocab) + "\n")
    return BertTokenizer(str(p), do_lower_case=True)


PAPER = {
    "TITLE": "title",
    "ABSTRACT": ["alpha beta gamma delta", "epsilon zeta eta"],
    "ENTITIES": [["beta gamma"], ["zeta", "missingentity"]],
}


def test_find_sublist_range():
    assert find_sublist_range([1, 2, 3, 4], [2, 3]) == [1, 2]
    assert find_sublist_range([1, 2, 3], [3, 4]) is None
    assert find_sublist_range([1, 2], []) is None
    # first occurrence wins
    assert find_sublist_range([5, 6, 5, 6], [5, 6]) == [0, 1]


def test_ner_token_spans_global_idxs(tok):
    fb, docs = prepare_abstracts([PAPER], tok, max_sents=6, return_docs=True)
    spans = ner_token_spans([PAPER], tok, docs)[0]
    # layout: [CLS] title [SEP](title-sep) | alpha beta gamma delta | eps zeta eta
    # title tokens get global idxs 1,2 (excluded); sent0 tokens 3..6, sent1 7..9
    assert docs[0].sent_token_idxs[0] == [3, 4, 5, 6]
    assert spans[0] == [4, 5]          # "beta gamma"
    assert spans[1] == [8]             # "zeta"
    assert spans[2] == []              # unk entity not found in sentence


def test_entity_past_truncation_is_invalid(tok):
    # force a tiny token cap so sentence 2 is truncated away entirely
    long_paper = {
        "TITLE": "title",
        "ABSTRACT": ["alpha beta gamma delta", "epsilon zeta eta"],
        "ENTITIES": [["beta"], ["zeta"]],
    }
    fb, docs = prepare_abstracts([long_paper], tok, max_sents=6,
                                 max_num_toks=6, return_docs=True)
    spans = ner_token_spans([long_paper], tok, docs)[0]
    assert spans[0] == [4]   # still inside the cap
    assert spans[1] == []    # sentence truncated away -> one invalid slot
    assert len(spans) == 2   # every entity keeps a slot (no zip-drop desync)


def _make_model(tok, cfg):
    params = ConSentSpanEncoder(cfg, max_sents=6).init(
        jax.random.key(0), np.zeros((1, 8), np.int32), np.zeros((1, 8), np.int32),
        np.zeros((1, 8), np.int32), np.zeros((1, 2, 8), np.float32))["params"]
    return AspireContextNERSimilarityModel(
        name="ctx", bert_config=cfg, params=jax.tree_util.tree_map(np.asarray, params),
        tokenizer=tok, agg="ot", max_sents=6, ot_temp=5000.0)


def test_span_rep_is_mean_of_token_states(tok):
    cfg = BertConfig.tiny()
    m = _make_model(tok, cfg)
    encs = m.encode([PAPER])
    enc = encs[0]
    # rows: 2 sentences + 2 valid entities (missingentity dropped)
    assert enc.shape[0] == 4

    # oracle: same BERT forward, hand-computed span means
    fb, docs = prepare_abstracts([PAPER], tok, max_sents=6, return_docs=True)
    last, _ = BertModel(cfg).apply({"params": m.params["bert"]},
                                   jnp.asarray(fb.token_ids),
                                   jnp.asarray(fb.attn_mask))
    last = np.asarray(last)
    np.testing.assert_allclose(enc[2], last[0, [4, 5]].mean(axis=0),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(enc[3], last[0, [8]].mean(axis=0),
                               rtol=2e-5, atol=2e-5)


def test_span_pool_overlapping_spans():
    hidden = jnp.asarray(np.random.default_rng(0).normal(size=(1, 6, 4)),
                         jnp.float32)
    mask = np.zeros((1, 2, 6), np.float32)
    mask[0, 0, [1, 2]] = 1.0
    mask[0, 1, [2, 3, 4]] = 1.0  # overlaps span 0 at token 2
    reps = np.asarray(span_pool(hidden, jnp.asarray(mask)))
    h = np.asarray(hidden)
    np.testing.assert_allclose(reps[0, 0], h[0, [1, 2]].mean(0), rtol=1e-6)
    np.testing.assert_allclose(reps[0, 1], h[0, [2, 3, 4]].mean(0), rtol=1e-6)


def test_faceted_encoding_drops_invalid_entities(tok):
    cfg = BertConfig.tiny()
    m = _make_model(tok, cfg)
    enc = m.encode([PAPER])[0]                      # 2 sents + 2 valid ents
    data = {**PAPER, "FACETS": ["background_label", "method_label"]}
    got = m.get_faceted_encoding(enc, "method", data)
    # method sentence is idx 1; its only VALID entity ("zeta") sits at row 3
    np.testing.assert_array_equal(got, enc[[1, 3]])
    got_bg = m.get_faceted_encoding(enc, "background", data)
    np.testing.assert_array_equal(got_bg, enc[[0, 2]])


def test_context_ner_encode_quantized_covers_span_rows(tok):
    """encode_quantized must quantize the COMBINED sentence+span rows with
    the build_dense_index(dtype='int8') scheme (the span rows come from a
    separate program, so this family quantizes on host)."""
    cfg = BertConfig.tiny()
    m = _make_model(tok, cfg)
    enc, = m.encode([PAPER])
    (xi, sc), = m.encode_quantized([PAPER])
    assert xi.shape == enc.shape and xi.dtype == np.int8
    np.testing.assert_allclose(xi.astype(np.float32) * sc[:, None], enc,
                               atol=np.abs(enc).max() / 100)


def test_get_similarities_ladder_matches_per_pair(tok):
    """The 64/256/1024 chunk ladder must not change scores."""
    cfg = BertConfig.tiny()
    m = _make_model(tok, cfg)
    rng = np.random.default_rng(3)
    q = rng.normal(size=(3, cfg.hidden_size)).astype(np.float32)
    cands = [rng.normal(size=(int(rng.integers(1, 6)), cfg.hidden_size))
             .astype(np.float32) for _ in range(70)]  # spans two ladder sizes
    batched = m.get_similarities(q, cands)
    singles = np.asarray([m.get_similarity(q, c) for c in cands])
    np.testing.assert_allclose(batched, singles, rtol=1e-4, atol=1e-4)


def test_sbert_model_local_bert_dir(tok, tmp_path):
    """SbertSimilarityModel loads a local BERT dir and mean-pools."""
    import transformers
    hf_cfg = transformers.BertConfig(
        vocab_size=tok.vocab_size, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64)
    hf = transformers.BertModel(hf_cfg).eval()
    d = tmp_path / "sbert"
    hf.save_pretrained(d)
    tok.save_pretrained(d)
    from aspire_tpu.evaluation.models import SbertSimilarityModel, get_model
    m = get_model("sbtinybertsota", weights_dir=str(d))
    assert isinstance(m, SbertSimilarityModel)
    reps = m.encode([PAPER, PAPER])
    assert len(reps) == 2 and reps[0].shape == (2, 32)
    np.testing.assert_allclose(reps[0], reps[1], rtol=1e-5)
    # oracle mean pooling via torch on the same weights
    import torch
    enc = tok(PAPER["ABSTRACT"], padding="longest", return_tensors="pt")
    with torch.no_grad():
        out = hf(**enc).last_hidden_state
    mask = enc["attention_mask"][:, :, None].float()
    oracle = ((out * mask).sum(1) / mask.sum(1)).numpy()
    np.testing.assert_allclose(reps[0], oracle, rtol=1e-3, atol=1e-3)
    # cosine max-sim: identical papers -> similarity 1
    assert m.get_similarity(reps[0], reps[1]) == pytest.approx(1.0, abs=1e-5)
