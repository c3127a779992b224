"""Tests: generic layers, miswordabsbienc, predict utils, filter_metadata."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aspire_tpu.models.layers import FeedForwardNet, GatedAttention, straight_through
from aspire_tpu.models.doc_models import build_model
from aspire_tpu.core.config import ModelHParams
from aspire_tpu.models.bert import BertConfig
from aspire_tpu.data.gorc import filter_metadata


def test_ffn_shapes(rng):
    x = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    ffn = FeedForwardNet(out_dim=8, composition_dims=(32,))
    params = ffn.init(jax.random.key(0), x)
    y = ffn.apply(params, x)
    assert y.shape == (4, 8)
    score = FeedForwardNet(out_dim=1, composition_dims=(32,), score_ffn=True)
    p2 = score.init(jax.random.key(0), x)
    assert score.apply(p2, x).shape == (4, 1)


def test_gated_attention_masks(rng):
    x = jnp.asarray(rng.normal(size=(2, 6, 8)).astype(np.float32))
    lens = jnp.asarray([4, 6])
    ga = GatedAttention(embed_dim=8)
    params = ga.init(jax.random.key(0), x, lens)
    w = np.asarray(ga.apply(params, x, lens))
    np.testing.assert_allclose(w.sum(1), 1.0, rtol=1e-5)
    assert w[0, 4:].max() < 1e-12


def test_straight_through_grad():
    x = jnp.asarray([-0.5, 0.3, 2.0])
    y = straight_through(x)
    np.testing.assert_array_equal(np.asarray(y), [0.0, 1.0, 1.0])
    g = jax.grad(lambda x: jnp.sum(straight_through(x) * jnp.asarray([1.0, 2.0, 3.0])))(x)
    # reference STEFunction.backward = hardtanh(grad_output): the INCOMING
    # gradient clamped to [-1, 1], independent of x (generic_layers.py:128)
    np.testing.assert_allclose(np.asarray(g), [1.0, 1.0, 1.0])
    g_neg = jax.grad(lambda x: jnp.sum(straight_through(x) * jnp.asarray([-3.0, 0.5, -0.2])))(x)
    np.testing.assert_allclose(np.asarray(g_neg), [-1.0, 0.5, -0.2])


def test_miswordabsbienc_loss(rng):
    hp = ModelHParams(model_name="miswordabsbienc", score_aggregation="l2max",
                      sent_loss_prop=0.5, abs_loss_prop=0.5, cd_l1_prop=1e-4,
                      max_sents=4)
    model = build_model(hp, BertConfig.tiny())
    params = model.init_params(jax.random.key(0))
    t, smax = 16, 4
    def feats():
        return {
            "token_ids": jnp.asarray(rng.integers(5, 128, (3, t)).astype(np.int32)),
            "attn_mask": jnp.asarray(np.ones((3, t), np.int32)),
            "sent_ids": jnp.asarray(np.clip(rng.integers(-1, smax, (3, t)), -1, smax - 1).astype(np.int32)),
            "abs_lens": jnp.asarray(rng.integers(1, smax + 1, (3,)).astype(np.int32)),
        }
    batch = {"query": feats(), "pos": feats()}
    loss, grads = jax.value_and_grad(model.train_loss)(params, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(grads))


def test_filter_metadata():
    rows = [
        {"paper_id": "a", "has_grobid": True, "abstract": "x", "title": "t"},
        {"paper_id": "b", "has_grobid": False, "abstract": "x", "title": "t"},
        {"paper_id": "c", "has_grobid": True, "abstract": None, "title": "t"},
        {"paper_id": "d", "grobid_parse": {}, "abstract": "x", "title": "t"},
    ]
    kept = filter_metadata(rows)
    assert [r["paper_id"] for r in kept] == ["a"]


def test_filter_metadata_s2orc_schema():
    """S2ORC metadata-TSV fixture: the reference keeps has_grobid_text==True
    rows (pre_proc_gorc.py:39) and drops NaN rows per filter_nan_cols
    (:49-50).  Fields mirror the real S2ORC metadata schema."""
    def meta(pid, *, has_grobid_text, mag=("Computer Science",), doi="10.1/x",
             abstract="An abstract.", title="A title."):
        return {"paper_id": pid, "title": title, "abstract": abstract,
                "doi": doi, "mag_field_of_study": mag,
                "has_pdf_parse": True, "has_grobid_text": has_grobid_text,
                "pdf_parse_s2orc": f"pdf_parses/{pid}.jsonl",
                "year": 2020, "arxiv_id": None, "pubmed_id": None,
                "venue": "NAACL", "journal": ""}

    rows = [
        meta("10", has_grobid_text=True),
        meta("11", has_grobid_text=False),               # no full text
        meta("12", has_grobid_text=True, abstract=""),   # empty abstract
        meta("13", has_grobid_text=True, doi=float("nan")),
        meta("14", has_grobid_text=True, mag=None, doi=None),
    ]
    kept = filter_metadata(rows)
    assert [r["paper_id"] for r in kept] == ["10", "13", "14"]
    # the reference's filter_nan_cols semantics: drop rows missing these cols
    kept = filter_metadata(rows, filter_nan_cols=("doi", "mag_field_of_study"))
    assert [r["paper_id"] for r in kept] == ["10"]
