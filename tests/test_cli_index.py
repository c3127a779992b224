"""CLI build-index + rank end-to-end (subprocess)."""
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


def test_build_index_and_rank(tmp_path, rng):
    vocab_dir = tmp_path / "vb"
    vocab_dir.mkdir()
    (vocab_dir / "vocab.txt").write_text(
        "\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "title"] + WORDS))
    (vocab_dir / "tokenizer_config.json").write_text(
        json.dumps({"tokenizer_class": "BertTokenizer", "do_lower_case": True}))

    # train a tiny model first (produces run_dir with bert_config recorded)
    def doc():
        return {"TITLE": "title", "ABSTRACT": [
            " ".join(rng.choice(WORDS, 4)) for _ in range(int(rng.integers(1, 4)))]}
    with open(tmp_path / "train.jsonl", "w") as f:
        for _ in range(16):
            f.write(json.dumps({"query": doc(), "pos_context": doc()}) + "\n")
    cfg = {"model_name": "miswordbienc", "score_aggregation": "l2max",
           "train_size": 16, "batch_size": 8, "accumulated_batch_size": -1,
           "num_epochs": 1, "learning_rate": 1e-4, "num_warmup_steps": 2,
           "lr_decay_method": "warmuplin", "es_check_every": 100,
           "max_sents": 4, "update_rule": "adam", "decay_lr_every": 1,
           "base-pt-layer": str(vocab_dir)}
    (tmp_path / "cfg.json").write_text(json.dumps(cfg))
    r = run_cli(["train", "--config", str(tmp_path / "cfg.json"),
                 "--train", str(tmp_path / "train.jsonl"),
                 "--out", str(tmp_path / "run"), "--tokenizer", str(vocab_dir),
                 "--tiny", "--seq-len", "32"], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]

    # corpus + dataset (queries present in corpus as near-copies)
    from tests_evalds import make_eval_dataset
    papers, anns = make_eval_dataset(tmp_path, rng, WORDS)
    with open(tmp_path / "corpus.jsonl", "w") as f:
        for pid, p in papers.items():
            if not pid.startswith("q") or "c" in pid:  # candidates only
                f.write(json.dumps({"paper_id": pid, **p}) + "\n")

    r2 = run_cli(["build-index", "--corpus", str(tmp_path / "corpus.jsonl"),
                  "--run-dir", str(tmp_path / "run"),
                  "--tokenizer", str(vocab_dir),
                  "--out", str(tmp_path / "idx")], cwd=str(tmp_path))
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert (tmp_path / "idx" / "meta.json").exists()

    r3 = run_cli(["rank", "--index", str(tmp_path / "idx"),
                  "--dataset", "toy", "--dataset-dir", str(tmp_path),
                  "--model", "miswordbienc", "--run-dir", str(tmp_path / "run"),
                  "--tokenizer", str(vocab_dir),
                  "--out", str(tmp_path / "ranked"), "--k", "8",
                  "--rerank", "ot"], cwd=str(tmp_path))
    assert r3.returncode == 0, r3.stderr[-2000:]
    fname = tmp_path / "ranked" / "test-pid2pool-toy-miswordbienc-ranked.json"
    ranked = json.loads(fname.read_text())
    # near-copy candidates (q{i}c0, q{i}c1) must rank at the top
    for qpid, cands in ranked.items():
        top2 = {c for c, _ in cands[:2]}
        assert top2 == {f"{qpid}c0", f"{qpid}c1"}, (qpid, cands[:4])
    # readable neighbour dumps written per query (pp_gen_nearest.py:575-635)
    for qpid in ranked:
        assert (tmp_path / "ranked" / "neighbours" /
                f"{qpid}-neighbours.txt").exists()

    # sharded serving mesh + query-encoding cache: identical rankings
    r3b = run_cli(["rank", "--index", str(tmp_path / "idx"),
                   "--dataset", "toy", "--dataset-dir", str(tmp_path),
                   "--model", "miswordbienc", "--run-dir", str(tmp_path / "run"),
                   "--tokenizer", str(vocab_dir),
                   "--out", str(tmp_path / "ranked_sh"), "--k", "8",
                   "--rerank", "ot", "--n-shards", "8", "--q-chunk", "2",
                   "--cache", str(tmp_path / "qenc.h5"), "--no-dumps"],
                  cwd=str(tmp_path))
    assert r3b.returncode == 0, r3b.stderr[-2000:]
    ranked_sh = json.loads((tmp_path / "ranked_sh" /
                            "test-pid2pool-toy-miswordbienc-ranked.json").read_text())
    assert {q: [c for c, _ in v] for q, v in ranked.items()} == \
           {q: [c for c, _ in v] for q, v in ranked_sh.items()}
    assert (tmp_path / "qenc.h5").exists()
    # second run must reuse the cache (results unchanged)
    r3c = run_cli(["rank", "--index", str(tmp_path / "idx"),
                   "--dataset", "toy", "--dataset-dir", str(tmp_path),
                   "--model", "miswordbienc", "--run-dir", str(tmp_path / "run"),
                   "--tokenizer", str(vocab_dir),
                   "--out", str(tmp_path / "ranked_c2"), "--k", "8",
                   "--rerank", "ot",
                   "--cache", str(tmp_path / "qenc.h5"), "--no-dumps"],
                  cwd=str(tmp_path))
    assert r3c.returncode == 0, r3c.stderr[-2000:]
    ranked_c2 = json.loads((tmp_path / "ranked_c2" /
                            "test-pid2pool-toy-miswordbienc-ranked.json").read_text())
    assert {q: [c for c, _ in v] for q, v in ranked.items()} == \
           {q: [c for c, _ in v] for q, v in ranked_c2.items()}

    # int8 storage + bf16 encode: same top candidates through the same CLI
    r4 = run_cli(["build-index", "--corpus", str(tmp_path / "corpus.jsonl"),
                  "--run-dir", str(tmp_path / "run"),
                  "--tokenizer", str(vocab_dir), "--int8", "--bf16-compute",
                  "--out", str(tmp_path / "idx8")], cwd=str(tmp_path))
    assert r4.returncode == 0, r4.stderr[-2000:]
    r5 = run_cli(["rank", "--index", str(tmp_path / "idx8"),
                  "--dataset", "toy", "--dataset-dir", str(tmp_path),
                  "--model", "miswordbienc", "--run-dir", str(tmp_path / "run"),
                  "--tokenizer", str(vocab_dir),
                  "--out", str(tmp_path / "ranked8"), "--k", "8",
                  "--rerank", "ot"], cwd=str(tmp_path))
    assert r5.returncode == 0, r5.stderr[-2000:]
    ranked8 = json.loads((tmp_path / "ranked8" /
                          "test-pid2pool-toy-miswordbienc-ranked.json").read_text())
    for qpid, cands in ranked8.items():
        assert {c for c, _ in cands[:2]} == {f"{qpid}c0", f"{qpid}c1"}


def test_build_index_and_rank_cls_family(tmp_path, rng):
    """build-index --family cls + rank on a trained cospecter bi-encoder:
    the whole-abstract CLS serving path (reference pp_gen_nearest.py:638-726)."""
    vocab_dir = tmp_path / "vb"
    vocab_dir.mkdir()
    (vocab_dir / "vocab.txt").write_text(
        "\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "title"] + WORDS))
    (vocab_dir / "tokenizer_config.json").write_text(
        json.dumps({"tokenizer_class": "BertTokenizer", "do_lower_case": True}))

    def doc():
        return {"TITLE": "title", "ABSTRACT": [
            " ".join(rng.choice(WORDS, 4)) for _ in range(int(rng.integers(1, 4)))]}
    with open(tmp_path / "train.jsonl", "w") as f:
        for _ in range(16):
            f.write(json.dumps({"query": doc(), "pos_context": doc()}) + "\n")
    cfg = {"model_name": "cospecter", "score_aggregation": "l2max",
           "train_size": 16, "batch_size": 8, "accumulated_batch_size": -1,
           "num_epochs": 1, "learning_rate": 1e-4, "num_warmup_steps": 2,
           "lr_decay_method": "warmuplin", "es_check_every": 100,
           "max_sents": 4, "update_rule": "adam", "decay_lr_every": 1,
           "base-pt-layer": str(vocab_dir)}
    (tmp_path / "cfg.json").write_text(json.dumps(cfg))
    r = run_cli(["train", "--config", str(tmp_path / "cfg.json"),
                 "--train", str(tmp_path / "train.jsonl"),
                 "--out", str(tmp_path / "run"), "--tokenizer", str(vocab_dir),
                 "--tiny", "--seq-len", "32"], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]

    from tests_evalds import make_eval_dataset
    papers, anns = make_eval_dataset(tmp_path, rng, WORDS)
    with open(tmp_path / "corpus.jsonl", "w") as f:
        for pid, p in papers.items():
            if not pid.startswith("q") or "c" in pid:
                f.write(json.dumps({"paper_id": pid, **p}) + "\n")

    r2 = run_cli(["build-index", "--family", "cls",
                  "--corpus", str(tmp_path / "corpus.jsonl"),
                  "--run-dir", str(tmp_path / "run"),
                  "--tokenizer", str(vocab_dir),
                  "--out", str(tmp_path / "cidx")], cwd=str(tmp_path))
    assert r2.returncode == 0, r2.stderr[-2000:]
    meta = json.loads((tmp_path / "cidx" / "meta.json").read_text())
    assert meta["index_type"] == "cls"

    r3 = run_cli(["rank", "--index", str(tmp_path / "cidx"),
                  "--dataset", "toy", "--dataset-dir", str(tmp_path),
                  "--model", "cospecter", "--run-dir", str(tmp_path / "run"),
                  "--tokenizer", str(vocab_dir),
                  "--out", str(tmp_path / "cranked"), "--k", "8"],
                 cwd=str(tmp_path))
    assert r3.returncode == 0, r3.stderr[-2000:]
    ranked = json.loads((tmp_path / "cranked" /
                         "test-pid2pool-toy-cospecter-ranked.json").read_text())
    # near-copy candidates share the query's exact text -> identical CLS
    # reps -> they must rank at the top even for a barely-trained encoder
    for qpid, cands in ranked.items():
        assert {c for c, _ in cands[:2]} == {f"{qpid}c0", f"{qpid}c1"}, cands[:4]
        assert (tmp_path / "cranked" / "neighbours" /
                f"{qpid}-neighbours.txt").exists()

    # sharded serving: identical rankings
    r4 = run_cli(["rank", "--index", str(tmp_path / "cidx"),
                  "--dataset", "toy", "--dataset-dir", str(tmp_path),
                  "--model", "cospecter", "--run-dir", str(tmp_path / "run"),
                  "--tokenizer", str(vocab_dir), "--n-shards", "8",
                  "--out", str(tmp_path / "cranked_sh"), "--k", "8",
                  "--no-dumps"], cwd=str(tmp_path))
    assert r4.returncode == 0, r4.stderr[-2000:]
    ranked_sh = json.loads((tmp_path / "cranked_sh" /
                            "test-pid2pool-toy-cospecter-ranked.json").read_text())
    assert {q: [c for c, _ in v] for q, v in ranked.items()} == \
           {q: [c for c, _ in v] for q, v in ranked_sh.items()}

    # OT rerank and facets need sentence reps: refuse loudly on a CLS index
    r5 = run_cli(["rank", "--index", str(tmp_path / "cidx"),
                  "--dataset", "toy", "--dataset-dir", str(tmp_path),
                  "--model", "cospecter", "--run-dir", str(tmp_path / "run"),
                  "--tokenizer", str(vocab_dir),
                  "--out", str(tmp_path / "cx"), "--rerank", "ot"],
                 cwd=str(tmp_path))
    assert r5.returncode != 0 and "CLS index" in r5.stderr


def test_build_index_and_rank_sent_family(tmp_path, rng):
    """build-index --family sent + rank: sent-bert per-sentence reps with
    cosine max-sim (reference build_sentbert_reps +
    pp_gen_nearest.py:793-794)."""
    # tiny local HF BERT checkpoint (the sbert-baseline weights_dir path)
    mk = (
        "import json, pathlib, transformers\n"
        "td = pathlib.Path(%r)\n"
        "vocab = ['[PAD]', '[UNK]', '[CLS]', '[SEP]', '[MASK]', 'title'] + %r\n"
        "(td / 'hf').mkdir()\n"
        "(td / 'hf' / 'vocab.txt').write_text('\\n'.join(vocab))\n"
        "cfg = transformers.BertConfig(vocab_size=len(vocab), hidden_size=32,\n"
        "    num_hidden_layers=2, num_attention_heads=4, intermediate_size=64,\n"
        "    max_position_embeddings=64)\n"
        "transformers.BertModel(cfg).save_pretrained(td / 'hf')\n"
        "transformers.BertTokenizer(str(td / 'hf' / 'vocab.txt'))"
        ".save_pretrained(td / 'hf')\n"
    ) % (str(tmp_path), WORDS)
    r = subprocess.run([sys.executable, "-c", mk], capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stderr[-2000:]

    from tests_evalds import make_eval_dataset
    papers, anns = make_eval_dataset(tmp_path, rng, WORDS)
    with open(tmp_path / "corpus.jsonl", "w") as f:
        for pid, p in papers.items():
            if not pid.startswith("q") or "c" in pid:
                f.write(json.dumps({"paper_id": pid, **p}) + "\n")

    r2 = run_cli(["build-index", "--family", "sent",
                  "--model", "sbtinybertsota",
                  "--corpus", str(tmp_path / "corpus.jsonl"),
                  "--weights-dir", str(tmp_path / "hf"),
                  "--out", str(tmp_path / "sidx")], cwd=str(tmp_path))
    assert r2.returncode == 0, r2.stderr[-2000:]
    meta = json.loads((tmp_path / "sidx" / "meta.json").read_text())
    assert meta["score_type"] == "cosine"

    r3 = run_cli(["rank", "--index", str(tmp_path / "sidx"),
                  "--dataset", "toy", "--dataset-dir", str(tmp_path),
                  "--model", "sbtinybertsota",
                  "--weights-dir", str(tmp_path / "hf"),
                  "--out", str(tmp_path / "sranked"), "--k", "8",
                  "--n-shards", "8"], cwd=str(tmp_path))
    assert r3.returncode == 0, r3.stderr[-2000:]
    ranked = json.loads((tmp_path / "sranked" /
                         "test-pid2pool-toy-sbtinybertsota-ranked.json").read_text())
    for qpid, cands in ranked.items():
        # near-copies share the query's sentences -> cosine 1.0 on top
        assert {c for c, _ in cands[:2]} == {f"{qpid}c0", f"{qpid}c1"}, cands[:4]
        assert cands[0][1] == pytest.approx(1.0, abs=1e-4)
        # cosine scores live in [-1, 1]
        assert all(-1.001 <= s <= 1.001 for _, s in cands)

    # OT rerank is an l2/aspire scorer: refuse on a cosine index
    r4 = run_cli(["rank", "--index", str(tmp_path / "sidx"),
                  "--dataset", "toy", "--dataset-dir", str(tmp_path),
                  "--model", "sbtinybertsota",
                  "--weights-dir", str(tmp_path / "hf"),
                  "--out", str(tmp_path / "sx"), "--rerank", "ot"],
                 cwd=str(tmp_path))
    assert r4.returncode != 0 and "cosine" in r4.stderr
