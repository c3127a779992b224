"""Full-chain scale-down run: corpus -> train -> index -> rank -> evaluate.

Exercises SURVEY §7 slice ⑥ end-to-end ON ONE COMMAND SEQUENCE, with every
stage going through the public CLI exactly as a user would drive it:

  1. `data`  — synthesize an S2ORC-shaped batch-file corpus with topical
     structure (co-citations happen within a topic; abstracts share topic
     vocabulary), run the multiprocess gorc pipeline
     (data.corpus.run_gorc_pipeline) to mine aligned co-citation triples,
     and emit a local BertTokenizer vocab + train config + an eval dataset
     whose gold relevance is topic identity.
  2. `train` — `python -m aspire_tpu train` on the mined triples:
     full BERT-base sbalisentbienc (ts+ot losses), multi-epoch, dev-based
     early-stop checkpointing, compile cache, metrics.jsonl loss stream.
  3. `serve` — `build-index` over a held-out corpus, `rank` the query pool
     against it (OT rerank), evaluate the ranked pools with
     ranking_eval.eval_pool_ranking, and compare MAP against the expected
     MAP of a random ranking (100-permutation simulation on the same gold).

The quality signal is structural, not parity: a model trained from scratch
on the mined triples must place same-topic documents far above random.
Reference chain being mirrored: pre_proc_gorc.py -> pre_proc_cocits.py ->
main_fsim.py -> pre_proc_buildreps.py -> pp_gen_nearest.py ->
ranking_eval.py.

Usage:
  python scripts/e2e_chain.py --root /tmp/e2e --scale pilot --stage all
  python scripts/e2e_chain.py --root /tmp/e2e_full --scale full --stage data
  ... --stage train ... --stage serve
"""
from __future__ import annotations

import argparse
import gzip
import json
import os
import pathlib
import random
import subprocess
import sys
import time
import zlib

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent

SCALES = {
    # topics, cited/topic, pairs/topic, citers/pair, corpus docs/topic,
    # queries/topic-sample, epochs, seq_len, micro, accum, tiny_bert
    "pilot": dict(topics=4, cited=12, pairs=20, citers=2, corpus_per_topic=12,
                  n_query_topics=4, epochs=2, seq_len=64, micro=4, accum=8,
                  tiny=True, es_check_every=16, lr=1e-3, warmup=8,
                  search_k=40, batch_files=8, sent_words=(4, 6),
                  abs_sents=(3, 4)),
    "full": dict(topics=50, cited=60, pairs=600, citers=2, corpus_per_topic=40,
                 n_query_topics=25, epochs=2, seq_len=128, micro=8, accum=32,
                 tiny=False, es_check_every=800, lr=1e-4, warmup=200,
                 search_k=500, batch_files=32, sent_words=(6, 10),
                 abs_sents=(4, 6)),
}

FUNCTION_WORDS = ("we study the of and for with using on a method results "
                  "data model approach analysis new propose show that this "
                  "work system is are in to from by our").split()


def topic_word(t: int, j: int) -> str:
    return f"t{t}w{j}"


def make_lexicon(topics: int, words_per_topic: int = 30):
    return {t: [topic_word(t, j) for j in range(words_per_topic)]
            for t in range(topics)}


def make_sentence(rng, lex_t, sent_words=(6, 10)):
    n = rng.randint(*sent_words)
    words = [rng.choice(lex_t) if rng.random() < 0.6
             else rng.choice(FUNCTION_WORDS) for _ in range(n)]
    # capitalized sentence start + attached period so the regex sentencizer
    # (preprocess.sentencize fallback) splits abstracts correctly
    words[0] = words[0].capitalize()
    return " ".join(words) + "."


def make_abstract_sents(rng, lex_t, sc=None) -> list[str]:
    sw = sc["sent_words"] if sc else (6, 10)
    n_sents = rng.randint(*(sc["abs_sents"] if sc else (4, 6)))
    return [make_sentence(rng, lex_t, sw) for _ in range(n_sents)]


def make_abstract(rng, lex_t, sc=None) -> str:
    return " ".join(make_abstract_sents(rng, lex_t, sc))


def cited_paper(rng, pid, t, lex, sc):
    return {"paper_id": pid, "title": f"paper about {topic_word(t, 0)} methods",
            "abstract": make_abstract(rng, lex[t], sc)}


def citing_paper(rng, pid, t, lex, bib: list[str], sc=None):
    text = (f"we build on the {rng.choice(lex[t])} systems [1] and [2] "
            f"for {rng.choice(lex[t])} {rng.choice(FUNCTION_WORDS)} tasks .")
    s1, s2 = text.index("[1]"), text.index("[2]")
    return {
        "paper_id": pid, "title": f"citing {topic_word(t, 1)} paper",
        "abstract": make_abstract(rng, lex[t], sc),
        "has_grobid": True,
        "grobid_parse": {
            "bib_entries": {"BIBREF0": {"links": bib[0]},
                            "BIBREF1": {"links": bib[1]}},
            "body_text": [{
                "text": text,
                "cite_spans": [
                    {"start": s1, "end": s1 + 3, "ref_id": "BIBREF0"},
                    {"start": s2, "end": s2 + 3, "ref_id": "BIBREF1"},
                ]}],
        },
    }


def hashing_aligner(dim: int = 64):
    """Cheap deterministic sentence embedder for cc_align supervision:
    hashed bag-of-words (stands in for the reference's sentence encoder in
    pre_proc_cocits.py's alignment pass)."""
    def embed(sents: list[str]) -> np.ndarray:
        out = np.zeros((len(sents), dim), np.float32)
        for i, s in enumerate(sents):
            for w in s.lower().split():
                # crc32, not hash(): str hash is randomized per process
                # (PYTHONHASHSEED), which would make the mined alignment
                # labels differ run to run
                out[i, zlib.crc32(w.encode()) % dim] += 1.0
        n = np.linalg.norm(out, axis=1, keepdims=True)
        return out / np.maximum(n, 1e-6)
    return embed


def stage_data(root: pathlib.Path, sc: dict, seed: int = 0) -> None:
    from aspire_tpu.data.corpus import run_gorc_pipeline

    rng = random.Random(seed)
    lex = make_lexicon(sc["topics"])
    corpus_dir = root / "s2orc"
    corpus_dir.mkdir(parents=True, exist_ok=True)

    # ---- S2ORC-shaped batch files ----
    t0 = time.time()
    cited_pids = {t: [f"c{t}_{i}" for i in range(sc["cited"])]
                  for t in range(sc["topics"])}
    papers = []
    for t in range(sc["topics"]):
        for pid in cited_pids[t]:
            papers.append(cited_paper(rng, pid, t, lex, sc))
        pairs = set()
        while len(pairs) < sc["pairs"]:
            a, b = rng.sample(cited_pids[t], 2)
            pairs.add((min(a, b), max(a, b)))
        for pi, (a, b) in enumerate(sorted(pairs)):
            for ci in range(sc["citers"]):
                papers.append(citing_paper(
                    rng, f"p{t}_{pi}_{ci}", t, lex, [a, b], sc))
    rng.shuffle(papers)
    nb = sc["batch_files"]
    for b in range(nb):
        with gzip.open(corpus_dir / f"{b}.jsonl.gz", "wt") as f:
            for p in papers[b::nb]:
                f.write(json.dumps(p) + "\n")
    print(f"[data] wrote {len(papers)} papers into {nb} batch files "
          f"({time.time() - t0:.1f}s)", flush=True)

    # ---- gorc pipeline: batch files -> aligned co-citation triples ----
    t0 = time.time()
    summary = run_gorc_pipeline(
        str(corpus_dir), str(root / "triples"), processes=min(8, nb),
        train_size=2_000_000, dev_size=4000, aligner=hashing_aligner())
    print(f"[data] gorc pipeline: {summary} ({time.time() - t0:.1f}s)",
          flush=True)

    # ---- local tokenizer dir ----
    tok_dir = root / "tokenizer"
    tok_dir.mkdir(exist_ok=True)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", ".", "[", "]",
             "1", "2"] + FUNCTION_WORDS + [
        "paper", "about", "citing", "tasks", "systems", "build", "prior"]
    for t in range(sc["topics"]):
        vocab.extend(lex[t])
    (tok_dir / "vocab.txt").write_text("\n".join(dict.fromkeys(vocab)) + "\n")
    (tok_dir / "tokenizer_config.json").write_text(json.dumps(
        {"tokenizer_class": "BertTokenizer", "do_lower_case": True}))

    # ---- train config (reference sbalisentbienc-misup-otstuni.json shape,
    #      scaled down; lr raised for from-scratch training) ----
    n_train = summary["examples"]["train"]
    cfg = {
        "model_name": "sbalisentbienc", "base-pt-layer": str(tok_dir),
        "score_aggregation": "l2wasserstein", "geoml_blur": 0.05,
        "geoml_scaling": 0.9, "sent_sm_temp": 5000.0,
        "train_suffix": "cocitabsalign",
        "abs_loss_prop": 0.0, "sent_loss_prop": 1.0, "sentsup_loss_prop": 1.0,
        "train_size": n_train, "dev_size": summary["examples"]["dev"],
        "num_epochs": sc["epochs"], "batch_size": sc["micro"],
        "accumulated_batch_size": sc["accum"], "update_rule": "adam",
        "learning_rate": sc["lr"], "num_warmup_steps": sc["warmup"],
        "decay_lr_every": 1, "lr_decay_method": "warmuplin",
        "decay_lr_by": 0.95, "es_check_every": sc["es_check_every"],
        "fine_tune": True,
    }
    (root / "config.json").write_text(json.dumps(cfg, indent=1))

    # ---- sentence-encoder (cosentbert) config: the ALIGNER half of the
    #      two-model pipeline (reference main_sentsim.py + cosentbert) ----
    sent_cfg = {
        "model_name": "cosentbert", "base-pt-layer": str(tok_dir),
        "score_aggregation": "l2max", "train_suffix": "coppsent",
        "train_size": summary["sent_examples"]["train"],
        "dev_size": summary["sent_examples"]["dev"],
        "num_epochs": sc["epochs"], "batch_size": max(8, sc["micro"]),
        "accumulated_batch_size": -1, "update_rule": "adam",
        "learning_rate": sc["lr"], "num_warmup_steps": sc["warmup"],
        "decay_lr_every": 1, "lr_decay_method": "warmuplin",
        "decay_lr_by": 0.95, "es_check_every": sc["es_check_every"],
        "fine_tune": True,
    }
    (root / "config-sentenc.json").write_text(json.dumps(sent_cfg, indent=1))

    # ---- eval corpus + query pools (gold relevance = topic identity) ----
    eval_dir = root / "eval"
    eval_dir.mkdir(exist_ok=True)
    corpus_docs, anns = {}, {}
    for t in range(sc["topics"]):
        for i in range(sc["corpus_per_topic"]):
            pid = f"d{t}_{i}"
            corpus_docs[pid] = {
                "title": f"paper about {topic_word(t, 0)} methods",
                "abstract": make_abstract_sents(rng, lex[t], sc)}
    # fresh query docs per sampled topic (not present in the index)
    qtopics = rng.sample(range(sc["topics"]), sc["n_query_topics"])
    all_corpus_pids = sorted(corpus_docs)
    query_docs = {}
    for t in qtopics:
        qpid = f"q{t}"
        query_docs[qpid] = {
            "title": f"query about {topic_word(t, 0)} methods",
            "abstract": make_abstract_sents(rng, lex[t], sc)}
        anns[qpid] = {
            "cands": all_corpus_pids,
            "relevance_adju": [2 if p.startswith(f"d{t}_") else 0
                               for p in all_corpus_pids]}
    def clean(abstract):
        return [s if s.endswith(".") else s + " ." for s in abstract if s.strip()]
    with open(eval_dir / "abstracts-syn.jsonl", "w") as f:
        for pid, d in {**corpus_docs, **query_docs}.items():
            f.write(json.dumps({"paper_id": pid, "title": d["title"],
                                "abstract": clean(d["abstract"])}) + "\n")
    with open(eval_dir / "test-pid2anns-syn.json", "w") as f:
        json.dump(anns, f)
    qpids = sorted(anns)
    with open(eval_dir / "syn-evaluation_splits.json", "w") as f:
        json.dump({"dev": qpids[: len(qpids) // 2],
                   "test": qpids[len(qpids) // 2:]}, f)
    # the index corpus: only the d* docs
    with open(eval_dir / "corpus-index.jsonl", "w") as f:
        for pid, d in corpus_docs.items():
            f.write(json.dumps({"paper_id": pid, "title": d["title"],
                                "abstract": clean(d["abstract"])}) + "\n")
    print(f"[data] eval: {len(corpus_docs)} corpus docs, {len(anns)} queries",
          flush=True)


def run_cli(*args: str) -> None:
    cmd = [sys.executable, "-m", "aspire_tpu"] + list(args)
    print("[cli]", " ".join(cmd), flush=True)
    t0 = time.time()
    subprocess.run(cmd, check=True, cwd=str(REPO))
    print(f"[cli] done in {time.time() - t0:.1f}s", flush=True)


def stage_sentenc(root: pathlib.Path, sc: dict) -> None:
    """Train the cosentbert sentence encoder on the mined sentence pairs
    (reference main_sentsim.py train_model)."""
    args = ["train", "--config", str(root / "config-sentenc.json"),
            "--train", str(root / "triples" / "train-coppsent.jsonl"),
            "--dev", str(root / "triples" / "dev-coppsent.jsonl"),
            "--out", str(root / "run-sentenc"),
            "--tokenizer", str(root / "tokenizer"),
            "--seq-len", str(min(64, sc["seq_len"])),
            "--log_fname", str(root / "train-sentenc.log")]
    if sc["tiny"]:
        args.append("--tiny")
    run_cli(*args)


def stage_align(root: pathlib.Path, sc: dict) -> None:
    """Regenerate the aligned-cocitabs triples with the TRAINED sentence
    encoder as the aligner (reference pre_proc_cocits.py:447-455 semantics:
    encoder argmax alignments), replacing the crc32 bag-of-words stand-in."""
    run_cli("preprocess", "regen-examples",
            "--in-path", str(root / "triples"),
            "--out-path", str(root / "triples_enc"),
            "--extra", json.dumps({
                "aligner_run_dir": str(root / "run-sentenc"),
                "aligner_tokenizer": str(root / "tokenizer"),
                "train_size": 2_000_000, "dev_size": 4000}))


def stage_train(root: pathlib.Path, sc: dict, aligner: str = "crc32") -> None:
    triples = root / ("triples_enc" if aligner == "trained" else "triples")
    args = ["train", "--config", str(root / "config.json"),
            "--train", str(triples / "train-cocitabsalign.jsonl"),
            "--dev", str(triples / "dev-cocitabsalign.jsonl"),
            "--out", str(root / "run"),
            "--tokenizer", str(root / "tokenizer"),
            "--seq-len", str(sc["seq_len"]),
            "--log_fname", str(root / "train.log")]
    if sc["tiny"]:
        args.append("--tiny")
    run_cli(*args)


def stage_serve(root: pathlib.Path, sc: dict, aligner: str = "crc32") -> dict:
    eval_dir = root / "eval"
    run_cli("build-index", "--corpus", str(eval_dir / "corpus-index.jsonl"),
            "--out", str(root / "index"), "--run-dir", str(root / "run"),
            "--tokenizer", str(root / "tokenizer"), "--batch-size", "32")
    run_cli("rank", "--index", str(root / "index"), "--dataset", "syn",
            "--dataset-dir", str(eval_dir), "--model", "sbalisentbienc",
            "--run-dir", str(root / "run"),
            "--tokenizer", str(root / "tokenizer"),
            "--out", str(root / "ranked"), "--k", str(sc["search_k"]),
            "--rerank", "ot", "--ot-temp", "5000.0")

    # ---- evaluate the ranked pools + random baseline ----
    from aspire_tpu.evaluation.ranking_eval import eval_pool_ranking
    from aspire_tpu.evaluation.datasets import EvalDataset
    from aspire_tpu.evaluation.protocols import (per_query_metrics,
                                                 ranked_relevances)
    results = eval_pool_ranking(str(root / "ranked"), "syn", "sbalisentbienc",
                                dataset_dir=str(eval_dir))

    ds = EvalDataset("syn", str(eval_dir))
    gold = ds.get_gold_test_data()
    rnd = random.Random(7)
    rand_maps = []
    for _ in range(100):
        ranked = {q: [(c, 0.0)
                      for c in rnd.sample(list(g), len(g))]
                  for q, g in gold.items()}
        rels = ranked_relevances(ranked, gold)
        qm = per_query_metrics(rels, threshold_grade=ds.get_threshold_grade())
        rand_maps.append(float(np.mean([m["av_precision"]
                                        for m in qm.values()])))
    rand_map = float(np.mean(rand_maps))

    # loss curve from the metrics stream
    losses = []
    with open(root / "run" / "metrics.jsonl") as f:
        for line in f:
            m = json.loads(line)
            if m.get("kind") == "train_loss":
                losses.append((m["iter"], m["loss"]))
    summary = {
        "aligner": aligner,
        "map": {split: r["mean_av_precision"] for split, r in results.items()},
        "ndcg%20": {split: r["ndcg%20"] for split, r in results.items()},
        "random_map": round(rand_map, 4),
        "loss_first": losses[0] if losses else None,
        "loss_last": losses[-1] if losses else None,
        "n_loss_points": len(losses),
    }
    (root / f"e2e-summary-{aligner}.json").write_text(
        json.dumps(summary, indent=1))
    print("[serve] summary:", json.dumps(summary), flush=True)
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--scale", choices=list(SCALES), default="pilot")
    ap.add_argument("--stage", choices=["data", "sentenc", "align", "train",
                                        "serve", "all"], default="all")
    ap.add_argument("--aligner", choices=["crc32", "trained"],
                    default="trained",
                    help="crc32: hashed bag-of-words stand-in; trained: "
                        "train cosentbert on the mined sentence pairs and "
                        "align with it (the reference's two-model pipeline)")
    args = ap.parse_args()
    root = pathlib.Path(args.root)
    sc = SCALES[args.scale]
    trained = args.aligner == "trained"
    if args.stage in ("data", "all"):
        stage_data(root, sc)
    if trained and args.stage in ("sentenc", "all"):
        stage_sentenc(root, sc)
    if trained and args.stage in ("align", "all"):
        stage_align(root, sc)
    if args.stage in ("train", "all"):
        stage_train(root, sc, args.aligner)
    if args.stage in ("serve", "all"):
        stage_serve(root, sc, args.aligner)


if __name__ == "__main__":
    main()
