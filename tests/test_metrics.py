"""Metric tests: values from the doctest examples embedded in the reference
metric docstrings (rank_metrics.py / utils/metrics.py -- the bwhite gist)."""
import numpy as np
import pytest

from aspire_tpu.evaluation.metrics import (
    mean_reciprocal_rank, r_precision, precision_at_k, average_precision,
    mean_average_precision, dcg_at_k, ndcg_at_k, recall_at_k, compute_metrics,
)
from aspire_tpu.evaluation.protocols import (
    aggregate_crossval, aggregate_split, per_query_metrics, rank_candidates,
    ranked_relevances, load_csfcube_folds, significance_test,
)


def test_mrr():
    assert np.isclose(mean_reciprocal_rank([[0, 0, 1], [0, 1, 0], [1, 0, 0]]), 0.61111111)
    assert np.isclose(mean_reciprocal_rank([[0, 0, 0], [0, 1, 0], [1, 0, 0]]), 0.5)
    assert np.isclose(mean_reciprocal_rank([[0, 0, 0, 1], [1, 0, 0], [1, 0, 0]]), 0.75)


def test_r_precision():
    assert r_precision([0, 0, 1]) == pytest.approx(1 / 3)
    assert r_precision([0, 1, 0]) == pytest.approx(0.5)
    assert r_precision([1, 0, 0]) == pytest.approx(1.0)


def test_precision_at_k():
    r = [0, 0, 1]
    assert precision_at_k(r, 1) == 0.0
    assert precision_at_k(r, 2) == 0.0
    assert precision_at_k(r, 3) == pytest.approx(1 / 3)
    with pytest.raises(ValueError):
        precision_at_k(r, 4)


def test_average_precision():
    r = [1, 1, 0, 1, 0, 1, 0, 0, 0, 1]
    assert average_precision(r) == pytest.approx(0.78333333)
    assert mean_average_precision([r]) == pytest.approx(0.78333333)
    assert mean_average_precision([r, [0]]) == pytest.approx(0.39166666)


def test_ndcg():
    r = [3, 2, 3, 0, 0, 1, 2, 2, 3, 0]
    assert ndcg_at_k(r, 1) == 1.0
    r = [2, 1, 2, 0]
    assert ndcg_at_k(r, 4) == pytest.approx(0.9203032077642922)
    assert ndcg_at_k(r, 4, method=1) == pytest.approx(0.96519546960144276)
    assert ndcg_at_k([0], 1) == 0.0
    assert ndcg_at_k([1], 2) == 1.0


def test_recall_at_k():
    assert recall_at_k([1, 0, 1, 1], 2, 3) == pytest.approx(1 / 3)
    assert recall_at_k([0, 0, 0], 2, 0) == 0.0


def test_compute_metrics_keys_and_binarization():
    rels = [3, 0, 2, 1, 0, 0, 2, 0, 0, 0] + [0] * 15
    m = compute_metrics(rels, threshold_grade=2)
    for key in ("ndcg", "ndcg@20", "ndcg@50", "ndcg%20", "precision@5",
                "recall@20", "f1@10", "r_precision", "av_precision",
                "reciprocal_rank"):
        assert key in m
    # binary with threshold 2: [1,0,1,0,0,0,1,0,0,0]
    assert m["precision@5"] == pytest.approx(2 / 5)
    assert m["reciprocal_rank"] == 1.0
    # threshold 1 flips the grade-1 candidate to relevant
    m1 = compute_metrics(rels, threshold_grade=1)
    assert m1["precision@5"] == pytest.approx(3 / 5)


def test_crossval_protocol_shapes():
    folds = load_csfcube_folds()
    qmetrics = {}
    rng = np.random.default_rng(0)
    for facet in ("background", "method", "result", "all"):
        for fold in folds[facet].values():
            for qid in fold:
                if qid not in qmetrics:
                    rels = list(rng.integers(0, 4, size=30))
                    qmetrics[qid] = compute_metrics(rels, threshold_grade=2)
    test_agg = aggregate_crossval(qmetrics, "background", "test")
    dev_agg = aggregate_crossval(qmetrics, "background", "dev")
    assert "mean_av_precision" in test_agg and "mean_reciprocal_rank" in dev_agg
    # test = mean of the two fold means; folds are complementary -> differs from dev
    f1 = np.mean([qmetrics[q]["av_precision"] for q in folds["background"]["fold1_test"]])
    f2 = np.mean([qmetrics[q]["av_precision"] for q in folds["background"]["fold2_test"]])
    assert test_agg["mean_av_precision"] == pytest.approx((f1 + f2) / 2)
    assert dev_agg["mean_av_precision"] == pytest.approx(
        np.mean([qmetrics[q]["av_precision"] for q in folds["background"]["fold1_dev"]]))


def test_rank_and_split_aggregation():
    scores = {"q1": {"a": 0.9, "b": 0.1, "c": 0.5}, "q2": {"a": 0.2, "b": 0.8}}
    gold = {"q1": {"a": 2, "b": 0, "c": 1}, "q2": {"a": 3, "b": 0}}
    ranked = rank_candidates(scores)
    assert [c for c, _ in ranked["q1"]] == ["a", "c", "b"]
    rels = ranked_relevances(ranked, gold)
    assert rels["q1"] == [2, 1, 0]
    qm = per_query_metrics(rels, threshold_grade=2)
    agg = aggregate_split(qm)
    assert 0.0 <= agg["mean_av_precision"] <= 1.0
    agg_dev = aggregate_split(qm, split_qids=["q1"])
    assert agg_dev["mean_av_precision"] == pytest.approx(qm["q1"]["av_precision"])


def test_significance():
    rng = np.random.default_rng(1)
    qa = {f"q{i}": {"av_precision": float(0.8 + 0.05 * rng.standard_normal())}
          for i in range(30)}
    qb = {f"q{i}": {"av_precision": float(0.3 + 0.05 * rng.standard_normal())}
          for i in range(30)}
    t, p, sig = significance_test(qa, qb)
    assert sig and t > 0
