"""End-to-end evaluation pipeline test on a synthetic faceted dataset.

Correctness signal: relevant candidates are textual near-copies of the query,
so ANY encoder (even random-weighted) must rank them at the top -> MAP ~ 1.
"""
import json
import numpy as np
import pytest
from transformers import BertTokenizer

from aspire_tpu.models.bert import BertConfig
from aspire_tpu.evaluation.datasets import EvalDataset
from aspire_tpu.evaluation.models import AspireSimilarityModel, ClsSimilarityModel
from aspire_tpu.evaluation.evaluate import run_evaluation
import jax

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
         "iota", "kappa"]


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "title"] + WORDS
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(vocab) + "\n")
    return BertTokenizer(str(p), do_lower_case=True)


def make_dataset(root, rng, n_queries=4, n_cands=12, name="toy"):
    """Queries q0..; for each, cands: 3 near-copies (relevant, grade 2-3) and
    the rest random (grade 0)."""
    papers = {}
    anns = {}
    for qi in range(n_queries):
        qsents = [" ".join(rng.choice(WORDS, 4)) for _ in range(3)]
        qpid = f"q{qi}"
        papers[qpid] = {"title": "title " + str(qi), "abstract": qsents}
        cands, rels = [], []
        for ci in range(n_cands):
            cpid = f"q{qi}c{ci}"
            if ci < 3:  # near-copy: same sentences, one word appended
                papers[cpid] = {"title": "title " + str(qi),
                                "abstract": qsents}
                rels.append(2 + (ci % 2))
            else:
                papers[cpid] = {"title": "title x",
                                "abstract": [" ".join(rng.choice(WORDS, 4))
                                             for _ in range(2)]}
                rels.append(0)
            cands.append(cpid)
        anns[qpid] = {"cands": cands, "relevance_adju": rels}
    with open(root / f"abstracts-{name}.jsonl", "w") as f:
        for pid, p in papers.items():
            f.write(json.dumps({"paper_id": pid, **p}) + "\n")
    with open(root / f"test-pid2anns-{name}.json", "w") as f:
        json.dump(anns, f)
    with open(root / f"{name}-evaluation_splits.json", "w") as f:
        json.dump({"dev": [f"q{i}" for i in range(2)],
                   "test": [f"q{i}" for i in range(2, n_queries)]}, f)
    return papers, anns


@pytest.mark.parametrize("agg", ["l2max", "ot"])
def test_end_to_end_eval(tmp_path, tok, rng, agg):
    make_dataset(tmp_path, rng)
    ds = EvalDataset("toy", str(tmp_path))
    cfg = BertConfig.tiny()
    enc = AspireSimilarityModel(
        name="aspire_toy", bert_config=cfg,
        params=jax.tree_util.tree_map(
            np.asarray,
            __import__("aspire_tpu.models.encoders", fromlist=["ConSentEncoder"])
            .ConSentEncoder(cfg, max_sents=6)
            .init(jax.random.key(0), *(np.zeros((1, 8), np.int32),) * 3)["params"]),
        tokenizer=tok, agg=agg, max_sents=6, ot_temp=5000.0)
    results_dir = str(tmp_path / "results")
    out = run_evaluation(enc, ds, results_dir,
                         cache_path=str(tmp_path / "enc.h5"))
    # near-copy candidates must rank on top for every query -> perfect AP
    for split in ("dev", "test"):
        assert out["all"][split]["mean_av_precision"] > 0.99, out["all"][split]
    # artifacts exist
    import os
    assert os.path.exists(os.path.join(results_dir, "scores.json"))
    assert os.path.exists(os.path.join(results_dir, "query-evaluations.csv"))
    assert os.path.exists(os.path.join(results_dir, "aggregated-evaluations.csv"))


def test_encoding_cache_roundtrip(tmp_path, tok, rng):
    make_dataset(tmp_path, rng, n_queries=2, n_cands=4)
    ds = EvalDataset("toy", str(tmp_path))
    from aspire_tpu.models.encoders import ConSentEncoder
    cfg = BertConfig.tiny()
    params = ConSentEncoder(cfg, max_sents=6).init(
        jax.random.key(0), *(np.zeros((1, 8), np.int32),) * 3)["params"]
    enc = AspireSimilarityModel(name="m", bert_config=cfg, params=params,
                                tokenizer=tok, agg="l2max", max_sents=6)
    enc.set_encodings_cache(str(tmp_path / "c.h5"))
    e1 = enc.get_encoding(["q0", "q1"], ds)
    # second call must hit the cache and return identical arrays
    e2 = enc.get_encoding(["q0", "q1"], ds)
    for pid in e1:
        np.testing.assert_array_equal(np.asarray(e1[pid]), np.asarray(e2[pid]))


def test_faceted_encoding_filter(tok):
    cfg = BertConfig.tiny()
    from aspire_tpu.models.encoders import ConSentEncoder
    params = ConSentEncoder(cfg, max_sents=6).init(
        jax.random.key(0), *(np.zeros((1, 8), np.int32),) * 3)["params"]
    m = AspireSimilarityModel(name="m", bert_config=cfg, params=params,
                              tokenizer=tok, agg="l2max", max_sents=6)
    enc = np.arange(12, dtype=np.float32).reshape(4, 3)
    data = {"FACETS": ["background_label", "objective_label", "method_label",
                       "result_label"]}
    got = m.get_faceted_encoding(enc, "background", data)
    # objective maps to background -> rows 0 and 1
    np.testing.assert_array_equal(got, enc[[0, 1]])
    got_m = m.get_faceted_encoding(enc, "method", data)
    np.testing.assert_array_equal(got_m, enc[[2]])
    # sentence-entity: entities of facet sentences appended after all sents
    m.encoding_type = "sentence-entity"
    data["ENTITIES"] = [["e1"], [], ["e2", "e3"], ["e4"]]
    enc2 = np.arange(24, dtype=np.float32).reshape(8, 3)
    got_se = m.get_faceted_encoding(enc2, "method", data)
    # method sentence idx 2; its entities are global rows 4+1=5,6
    np.testing.assert_array_equal(got_se, enc2[[2, 5, 6]])


def test_encode_without_cache_warns(tmp_path, tok, rng, caplog):
    """`--actions encode` without a cache must warn loudly, not silently
    no-op (the scoring stage still encodes on the fly)."""
    import logging
    make_dataset(tmp_path, rng, n_queries=2, n_cands=4)
    ds = EvalDataset("toy", str(tmp_path))
    from aspire_tpu.models.encoders import ConSentEncoder
    cfg = BertConfig.tiny()
    params = ConSentEncoder(cfg, max_sents=6).init(
        jax.random.key(0), *(np.zeros((1, 8), np.int32),) * 3)["params"]
    enc = AspireSimilarityModel(name="m", bert_config=cfg, params=params,
                                tokenizer=tok, agg="l2max", max_sents=6)
    with caplog.at_level(logging.WARNING, logger="aspire_tpu.evaluation.evaluate"):
        run_evaluation(enc, ds, str(tmp_path / "res"), actions=("encode",),
                       cache_path=None)
    assert any("without a cache" in r.message for r in caplog.records)


def test_scores_file_stores_negated_similarity(tmp_path, tok, rng):
    """Reference file contract: scores.json holds -1*similarity (a distance),
    most-similar first -> stored values are non-decreasing per query."""
    import os
    make_dataset(tmp_path, rng, n_queries=2, n_cands=4)
    ds = EvalDataset("toy", str(tmp_path))
    from aspire_tpu.models.encoders import ConSentEncoder
    cfg = BertConfig.tiny()
    params = ConSentEncoder(cfg, max_sents=6).init(
        jax.random.key(0), *(np.zeros((1, 8), np.int32),) * 3)["params"]
    enc = AspireSimilarityModel(name="m", bert_config=cfg, params=params,
                                tokenizer=tok, agg="l2max", max_sents=6)
    results_dir = str(tmp_path / "r")
    run_evaluation(enc, ds, results_dir, actions=("score",),
                   cache_path=str(tmp_path / "c.h5"))
    # score-only run must have attached the cache (score reads/writes it)
    assert enc.cache is not None
    with open(os.path.join(results_dir, "scores.json")) as f:
        scores = json.load(f)
    for q, rows in scores.items():
        vals = [v for _, v in rows]
        assert vals == sorted(vals), "stored distances must ascend"


def test_csfcube_unfaceted_rejected_before_scoring(tmp_path):
    class _Stub:
        name = "csfcube"
    with pytest.raises(ValueError, match="per facet"):
        run_evaluation(None, _Stub(), str(tmp_path), actions=("score",),
                       facets=[None])


def test_get_similarities_empty_pool(tok, rng):
    from aspire_tpu.models.encoders import ConSentEncoder
    cfg = BertConfig.tiny()
    params = ConSentEncoder(cfg, max_sents=6).init(
        jax.random.key(0), *(np.zeros((1, 8), np.int32),) * 3)["params"]
    enc = AspireSimilarityModel(name="m", bert_config=cfg, params=params,
                                tokenizer=tok, agg="l2max", max_sents=6)
    out = enc.get_similarities(rng.normal(size=(2, cfg.hidden_size)), [])
    assert out.shape == (0,)


def test_faceted_ner_encoding_survives_truncation(tok, rng):
    """A paper whose sentences+entities exceed max_sents must facet-filter
    to the rows that actually exist (prefix truncation), not index past the
    encoding (reference has no max_sents cap; this clamp is port-specific)."""
    from aspire_tpu.models.encoders import ConSentEncoder
    from aspire_tpu.evaluation.models import AspireNERSimilarityModel
    cfg = BertConfig.tiny()
    params = ConSentEncoder(cfg, max_sents=4).init(
        jax.random.key(0), *(np.zeros((1, 8), np.int32),) * 3)["params"]
    m = AspireNERSimilarityModel(name="m", bert_config=cfg, params=params,
                                 tokenizer=tok, agg="l2max", max_sents=4)
    assert m.encoding_type == "sentence-entity"   # set by __init__, not factory
    paper = {"TITLE": "title",
             "ABSTRACT": ["alpha beta", "gamma delta", "epsilon zeta"],
             "ENTITIES": [["alpha"], ["delta", "gamma"], ["zeta"]],
             "FACETS": ["background_label", "method_label", "method_label"]}
    enc, = m.encode([paper])
    assert enc.shape[0] == 4     # 3 sents + 4 ents truncated to max_sents
    got = m.get_faceted_encoding(enc, "method", paper)
    # method rows: sentences 1,2 kept; entity rows (global ids 4,5,6) all
    # truncated away -> only the two sentence rows survive
    np.testing.assert_array_equal(got, enc[[1, 2]])


def test_rerun_evaluation_preserves_cache(tmp_path, tok, rng):
    """Two run_evaluation calls on the SAME model + cache: the second must
    not re-attach over the live h5 handle (HDF5 same-process locking would
    trip the open-'w' fallback and truncate every cached encoding)."""
    import h5py
    make_dataset(tmp_path, rng, n_queries=2, n_cands=4)
    ds = EvalDataset("toy", str(tmp_path))
    from aspire_tpu.models.encoders import ConSentEncoder
    cfg = BertConfig.tiny()
    params = ConSentEncoder(cfg, max_sents=6).init(
        jax.random.key(0), *(np.zeros((1, 8), np.int32),) * 3)["params"]
    enc = AspireSimilarityModel(name="m", bert_config=cfg, params=params,
                                tokenizer=tok, agg="l2max", max_sents=6)
    cache = str(tmp_path / "c.h5")
    run_evaluation(enc, ds, str(tmp_path / "r1"), actions=("encode",),
                   cache_path=cache)
    n1 = len(enc.cache.keys())
    assert n1 > 0
    run_evaluation(enc, ds, str(tmp_path / "r2"), actions=("encode",),
                   cache_path=cache)
    assert len(enc.cache.keys()) == n1
    enc.cache.close()
    enc.cache = None
    with h5py.File(cache, "r") as f:     # survived on disk too
        assert len(f.keys()) == n1


def test_missing_split_file(tmp_path, rng):
    """Reference datasets that ship evaluation_splits.json must FAIL when
    it's absent (wrong --root-path), not silently aggregate plain-mean;
    ad-hoc datasets keep the documented fallback."""
    make_dataset(tmp_path, rng, n_queries=2, n_cands=4, name="relish")
    import os
    os.remove(tmp_path / "relish-evaluation_splits.json")
    ds = EvalDataset("relish", str(tmp_path))
    with pytest.raises(FileNotFoundError, match="root-path"):
        ds.get_test_dev_split()
    make_dataset(tmp_path, rng, n_queries=2, n_cands=4, name="adhoc")
    os.remove(tmp_path / "adhoc-evaluation_splits.json")
    assert EvalDataset("adhoc", str(tmp_path)).get_test_dev_split() is None
