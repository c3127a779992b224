"""CLI pool-protocol ranking: pools STRICTLY SMALLER than the corpus.

The r3 verdict's top gap: `rank` did global top-k, so on any dataset where
pools are a subset of the corpus its output crashed eval_pool_ranking and
silently changed metric denominators.  This test pins the fix end-to-end:

  * `rank` (default --protocol pool) ranks each query's FULL candidate pool;
  * `rank -> eval_pool_ranking` runs without error on pools != corpus;
  * the aggregates are BIT-EQUAL to the evaluate-path (`run_evaluation`)
    metrics for the same model -- the two stacks implement one protocol;
  * the sharded serving mesh produces identical rankings;
  * --protocol global output on the same dataset raises the named
    PoolMismatchError (out-of-pool candidates), not a bare KeyError.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
ENV = {**os.environ, "JAX_PLATFORMS": "cpu",
       "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}


def run_cli(args, cwd):
    code = ("import jax; jax.config.update('jax_platforms','cpu');"
            "from aspire_tpu.cli import main; main(%r)" % (args,))
    return subprocess.run([sys.executable, "-c", code], cwd=cwd, env=ENV,
                          capture_output=True, text=True, timeout=900)


@pytest.fixture(scope="module")
def pool_env(tmp_path_factory):
    """Train a tiny model; build a corpus where pools are a strict subset."""
    rng = np.random.default_rng(7)
    tmp = tmp_path_factory.mktemp("pool")
    vocab_dir = tmp / "vb"
    vocab_dir.mkdir()
    (vocab_dir / "vocab.txt").write_text(
        "\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "title"] + WORDS))
    (vocab_dir / "tokenizer_config.json").write_text(
        json.dumps({"tokenizer_class": "BertTokenizer", "do_lower_case": True}))

    def doc():
        return {"TITLE": "title", "ABSTRACT": [
            " ".join(rng.choice(WORDS, 4)) for _ in range(int(rng.integers(1, 4)))]}
    with open(tmp / "train.jsonl", "w") as f:
        for _ in range(16):
            f.write(json.dumps({"query": doc(), "pos_context": doc()}) + "\n")
    cfg = {"model_name": "miswordbienc", "score_aggregation": "l2max",
           "train_size": 16, "batch_size": 8, "accumulated_batch_size": -1,
           "num_epochs": 1, "learning_rate": 1e-4, "num_warmup_steps": 2,
           "lr_decay_method": "warmuplin", "es_check_every": 100,
           "max_sents": 4, "update_rule": "adam", "decay_lr_every": 1,
           "base-pt-layer": str(vocab_dir)}
    (tmp / "cfg.json").write_text(json.dumps(cfg))
    r = run_cli(["train", "--config", str(tmp / "cfg.json"),
                 "--train", str(tmp / "train.jsonl"),
                 "--out", str(tmp / "run"), "--tokenizer", str(vocab_dir),
                 "--tiny", "--seq-len", "32"], cwd=str(tmp))
    assert r.returncode == 0, r.stderr[-2000:]

    # dataset with DISTINCT candidate texts (no exact ties) + extra
    # distractor docs so pools are a strict subset of the corpus
    papers, anns = {}, {}
    for qi in range(3):
        qsents = [" ".join(rng.choice(WORDS, 4)) for _ in range(3)]
        qpid = f"q{qi}"
        papers[qpid] = {"title": "title q", "abstract": qsents}
        cands, rels = [], []
        for ci in range(8):
            cpid = f"q{qi}c{ci}"
            if ci < 2:   # near-copies: query sents + one extra sentence
                papers[cpid] = {"title": "title q", "abstract":
                                qsents + [" ".join(rng.choice(WORDS, 3 + ci))]}
                rels.append(2)
            else:
                papers[cpid] = {"title": "title x", "abstract": [
                    " ".join(rng.choice(WORDS, 4)) for _ in range(2)]}
                rels.append(0)
            cands.append(cpid)
        anns[qpid] = {"cands": cands, "relevance_adju": rels}
    with open(tmp / "abstracts-toy.jsonl", "w") as f:
        for pid, p in papers.items():
            f.write(json.dumps({"paper_id": pid, **p}) + "\n")
    with open(tmp / "test-pid2anns-toy.json", "w") as f:
        json.dump(anns, f)
    with open(tmp / "toy-evaluation_splits.json", "w") as f:
        json.dump({"dev": ["q0"], "test": ["q1", "q2"]}, f)

    # corpus: all pool candidates + 10 distractors NOT in any pool
    with open(tmp / "corpus.jsonl", "w") as f:
        for pid, p in papers.items():
            if "c" in pid:
                f.write(json.dumps({"paper_id": pid, **p}) + "\n")
        for di in range(10):
            f.write(json.dumps({"paper_id": f"extra{di}",
                                "title": "title x",
                                "abstract": [" ".join(rng.choice(WORDS, 4))
                                             for _ in range(2)]}) + "\n")
    r2 = run_cli(["build-index", "--corpus", str(tmp / "corpus.jsonl"),
                  "--run-dir", str(tmp / "run"),
                  "--tokenizer", str(vocab_dir),
                  "--out", str(tmp / "idx")], cwd=str(tmp))
    assert r2.returncode == 0, r2.stderr[-2000:]
    return tmp, vocab_dir


def test_pool_protocol_end_to_end_and_evaluate_parity(pool_env):
    tmp, vocab_dir = pool_env
    r = run_cli(["rank", "--index", str(tmp / "idx"),
                 "--dataset", "toy", "--dataset-dir", str(tmp),
                 "--model", "miswordbienc", "--run-dir", str(tmp / "run"),
                 "--tokenizer", str(vocab_dir),
                 "--out", str(tmp / "ranked")], cwd=str(tmp))
    assert r.returncode == 0, r.stderr[-2000:]
    fname = tmp / "ranked" / "test-pid2pool-toy-miswordbienc-ranked.json"
    ranked = json.loads(fname.read_text())
    # the FULL pool is ranked -- every candidate, nothing else
    for qpid, cands in ranked.items():
        assert sorted(c for c, _ in cands) == sorted(
            f"{qpid}c{ci}" for ci in range(8))

    # eval_pool_ranking consumes it without error (pools != corpus)
    from aspire_tpu.evaluation.ranking_eval import eval_pool_ranking
    pool_res = eval_pool_ranking(str(tmp / "ranked"), "toy", "miswordbienc",
                                 dataset_dir=str(tmp))

    # evaluate path on the same model: aggregates must be bit-equal
    r2 = run_cli(["evaluate", "--dataset", "toy", "--dataset-dir", str(tmp),
                  "--model", "miswordbienc", "--run-dir", str(tmp / "run"),
                  "--tokenizer", str(vocab_dir),
                  "--results", str(tmp / "evalres"),
                  "--cache", str(tmp / "enc.h5")], cwd=str(tmp))
    assert r2.returncode == 0, r2.stderr[-2000:]
    # BIT-FOR-BIT: the evaluate path's ranked candidate order per query must
    # equal the serving pool path's (same model, same protocol, two stacks)
    scores = json.loads((tmp / "evalres" / "scores.json").read_text())
    assert {q: [c for c, _ in v] for q, v in ranked.items()} == \
           {q: [c for c, _ in v] for q, v in scores.items()}
    # aggregates agree (CSV float round-trip costs the 16th digit only)
    import pandas as pd
    agg = pd.read_csv(tmp / "evalres" / "aggregated-evaluations.csv")
    for _, row in agg.iterrows():
        split = row["split"]
        for metric, val in pool_res[split].items():
            assert row[metric] == pytest.approx(val, rel=1e-12), (
                split, metric, row[metric], val)


def test_pool_protocol_sharded_matches_single(pool_env):
    tmp, vocab_dir = pool_env
    r = run_cli(["rank", "--index", str(tmp / "idx"),
                 "--dataset", "toy", "--dataset-dir", str(tmp),
                 "--model", "miswordbienc", "--run-dir", str(tmp / "run"),
                 "--tokenizer", str(vocab_dir), "--n-shards", "8",
                 "--out", str(tmp / "ranked_sh"), "--no-dumps"], cwd=str(tmp))
    assert r.returncode == 0, r.stderr[-2000:]
    base = json.loads((tmp / "ranked" /
                       "test-pid2pool-toy-miswordbienc-ranked.json").read_text())
    sh = json.loads((tmp / "ranked_sh" /
                     "test-pid2pool-toy-miswordbienc-ranked.json").read_text())
    assert {q: [c for c, _ in v] for q, v in base.items()} == \
           {q: [c for c, _ in v] for q, v in sh.items()}


def test_global_protocol_output_raises_pool_mismatch(pool_env):
    tmp, vocab_dir = pool_env
    r = run_cli(["rank", "--index", str(tmp / "idx"),
                 "--dataset", "toy", "--dataset-dir", str(tmp),
                 "--model", "miswordbienc", "--run-dir", str(tmp / "run"),
                 "--tokenizer", str(vocab_dir), "--protocol", "global",
                 "--k", "12", "--out", str(tmp / "ranked_gl"),
                 "--no-dumps"], cwd=str(tmp))
    assert r.returncode == 0, r.stderr[-2000:]
    from aspire_tpu.evaluation.protocols import PoolMismatchError
    from aspire_tpu.evaluation.ranking_eval import eval_pool_ranking
    with pytest.raises(PoolMismatchError):
        eval_pool_ranking(str(tmp / "ranked_gl"), "toy", "miswordbienc",
                          dataset_dir=str(tmp))
    # intersect mode scores it anyway (loudly)
    res = eval_pool_ranking(str(tmp / "ranked_gl"), "toy", "miswordbienc",
                            dataset_dir=str(tmp), on_missing="intersect")
    assert "test" in res


def test_pool_candidate_missing_from_index_is_named(pool_env):
    tmp, vocab_dir = pool_env
    # dataset whose pool references a pid the index doesn't hold
    anns = json.loads((tmp / "test-pid2anns-toy.json").read_text())
    anns["q0"]["cands"] = anns["q0"]["cands"] + ["ghost-pid"]
    anns["q0"]["relevance_adju"] = anns["q0"]["relevance_adju"] + [0]
    ds2 = tmp / "ds2"
    ds2.mkdir(exist_ok=True)
    (ds2 / "test-pid2anns-toy.json").write_text(json.dumps(anns))
    with open(tmp / "abstracts-toy.jsonl") as f:
        abstracts = f.read()
    (ds2 / "abstracts-toy.jsonl").write_text(
        abstracts + json.dumps({"paper_id": "ghost-pid", "title": "g",
                                "abstract": ["ghost doc"]}) + "\n")
    (ds2 / "toy-evaluation_splits.json").write_text(
        (tmp / "toy-evaluation_splits.json").read_text())
    r = run_cli(["rank", "--index", str(tmp / "idx"),
                 "--dataset", "toy", "--dataset-dir", str(ds2),
                 "--model", "miswordbienc", "--run-dir", str(tmp / "run"),
                 "--tokenizer", str(vocab_dir),
                 "--out", str(tmp / "ranked_missing")], cwd=str(tmp))
    assert r.returncode != 0
    assert "ghost-pid" in r.stderr
