"""Preprocessing pipeline tests: filters, example generation, converters."""
import json
import os
import numpy as np
import pytest

from aspire_tpu.data.preprocess import (
    exclude_abstract, filter_cocitation_contexts, generate_examples_cocitabs,
    generate_examples_sent_rand, generate_examples_ict, sentencize,
    scidocs_to_common, treccovid_to_common,
)


def test_exclude_abstract():
    ok = ["one two three four five."] * 5
    assert not exclude_abstract(ok)
    assert exclude_abstract(ok[:2])              # too few sentences
    assert exclude_abstract(ok * 5)              # too many
    assert exclude_abstract(ok + ["a b c"])      # short sentence
    assert exclude_abstract(ok + ["w " * 85])    # long sentence


def test_sentencize_fallback():
    sents = sentencize("First sentence here. Second one too! Third (v2.0) ends.")
    assert len(sents) == 3


def test_filter_cocitation_contexts():
    cocits = {
        ("a", "b"): [
            ("p1", "we follow [1] and (2) in this method of testing things"),
            ("p1", "another context from the same citing paper [3] with words"),
            ("p2", "we follow [4] and (5) in this method of testing things"),  # dup modulo digits
            ("p3", "too short [6]"),
            ("p4", "no brackets at all in this sentence of many tokens here ok"),
        ],
        ("c", "d", "e", "f"): [("p5", "four cocited papers get dropped [7] entirely")],
        ("g", "h"): [("p6", "x " * 70 + "[8]")],
    }
    filt = filter_cocitation_contexts(cocits)
    assert ("c", "d", "e", "f") not in filt
    assert ("g", "h") not in filt            # only context too long
    assert len(filt[("a", "b")]) == 1        # dups + per-citing-pid + noise removed
    assert filt[("a", "b")][0][0] == "p1"


def make_abs(rng, pid):
    return {"title": f"title {pid}",
            "abstract": [" ".join(rng.choice(list("abcdefgh"), 5)) for _ in range(4)]}


def test_generate_examples_cocitabs_aligned(tmp_path, rng):
    pids = [f"p{i}" for i in range(20)]
    pid2abstract = {p: make_abs(rng, p) for p in pids}
    cocits = {}
    for i in range(0, 18, 2):
        cocits[(pids[i], pids[i + 1])] = [
            ("c1", f"context citing ({i}) with enough tokens to pass the filters"),
            ("c2", f"another context citing [{i}] also having enough tokens here"),
        ]

    def fake_aligner(sents):
        # deterministic per-sentence embedding
        return np.stack([np.frombuffer(
            __import__("hashlib").sha256(s.encode()).digest()[:16], np.uint8
        ).astype(np.float32) for s in sents])

    counts = generate_examples_cocitabs(cocits, pid2abstract, str(tmp_path),
                                        train_size=100, dev_size=10,
                                        aligner=fake_aligner)
    assert counts["train"] > 0 and counts["dev"] > 0
    train = [json.loads(l) for l in open(tmp_path / "train-cocitabsalign.jsonl")]
    dev = [json.loads(l) for l in open(tmp_path / "dev-cocitabsalign.jsonl")]
    for ex in train:
        assert len(ex["pos_context"]["cc_align"]) == 2
        assert len(ex["pos_context"]["abs_align"]) == 2
        qa = ex["query"]["ABSTRACT"]
        assert 0 <= ex["pos_context"]["cc_align"][0] < len(qa)
        assert "neg_context" not in ex
    for ex in dev:
        assert "neg_context" in ex
        assert "cc_align" in ex["neg_context"]
    # determinism: same seed -> same first example
    generate_examples_cocitabs(cocits, pid2abstract, str(tmp_path / "b"),
                               train_size=100, dev_size=10, aligner=fake_aligner)
    train2 = [json.loads(l) for l in open(tmp_path / "b" / "train-cocitabsalign.jsonl")]
    assert train[0] == train2[0]


def test_generate_sent_and_ict(tmp_path, rng):
    cocits_sent = {("a", "b"): [("p1", "sent one is here"), ("p2", "sent two is here"),
                                ("p3", "sent three is here")],
                   ("c", "d"): [("p4", "only one context")]}
    counts = generate_examples_sent_rand(cocits_sent, str(tmp_path))
    # reference combinatorics (pre_proc_cocits.py:294-318): ALL length-2
    # combinations per group -> C(3,2)=3 from the first key, C(1,2)=0 from
    # the second
    assert counts["train"] + counts["dev"] == 3
    exs = []
    for split in ("train", "dev"):
        p = tmp_path / f"{split}-coppsent.jsonl"
        if p.exists():
            exs += [json.loads(l) for l in open(p)]
    assert len(exs) == 3
    for ex in exs:
        # reference schema: raw sentence strings + citing/cited metadata
        assert isinstance(ex["query"], str) and isinstance(ex["pos_context"], str)
        assert len(ex["citing_pids"]) == 2
        assert ex["cited_pids"] == ["a", "b"]
    # pairs are ordered combinations of the group's contexts
    assert {(e["query"], e["pos_context"]) for e in exs} == {
        ("sent one is here", "sent two is here"),
        ("sent one is here", "sent three is here"),
        ("sent two is here", "sent three is here")}
    pid2abs = {f"p{i}": make_abs(rng, i) for i in range(5)}
    n = generate_examples_ict(pid2abs, str(tmp_path), n_examples=7)
    assert n == 7
    lines = [json.loads(l) for l in open(tmp_path / "train-ict.jsonl")]
    assert all(len(ex["query"]["ABSTRACT"]) == 1 for ex in lines)


def test_sent_rand_dev_negatives_from_dev_split(tmp_path):
    """Dev negatives are frozen and drawn from the DEV split's groups
    (pre_proc_cocits.py:308-312)."""
    cocits_sent = {
        (f"x{i}", f"y{i}"): [(f"c{i}a", f"context alpha number {i}"),
                             (f"c{i}b", f"context beta number {i}")]
        for i in range(10)
    }
    counts = generate_examples_sent_rand(cocits_sent, str(tmp_path))
    assert counts["train"] == 8 and counts["dev"] == 2  # C(2,2)=1 per group
    dev = [json.loads(l) for l in open(tmp_path / "dev-coppsent.jsonl")]
    train = [json.loads(l) for l in open(tmp_path / "train-coppsent.jsonl")]
    assert all("neg_context" in ex for ex in dev)
    assert all("neg_context" not in ex for ex in train)
    dev_groups = {tuple(ex["cited_pids"]) for ex in dev}
    dev_sents = {s for g in dev_groups for _, s in cocits_sent[g]}
    assert all(ex["neg_context"] in dev_sents for ex in dev)
    # determinism: same seed -> identical files
    generate_examples_sent_rand(cocits_sent, str(tmp_path / "b"))
    assert (tmp_path / "dev-coppsent.jsonl").read_text() == \
           (tmp_path / "b" / "dev-coppsent.jsonl").read_text()


def test_generate_cocitabs_contexts(tmp_path, rng):
    """The cospecter-contexts variant (generate_examples_cocitabs_contexts_rand,
    pre_proc_cocits.py:612-699): contexts bundled INSIDE pos_context,
    negatives from valid co-cite sets, C(len(group), 2) examples per group."""
    from aspire_tpu.data.preprocess import generate_examples_cocitabs_contexts
    pids = [f"p{i}" for i in range(12)]
    pid2abstract = {p: make_abs(rng, p) for p in pids}
    cocits = {}
    for i in range(0, 12, 3):   # groups of 3 cocited pids -> C(3,2)=3 each
        cocits[(pids[i], pids[i + 1], pids[i + 2])] = [
            (f"c{i}", f"citing context number ({i}) with plenty of tokens"),
            (f"c{i}x", f"second context [{i}] also with plenty of tokens"),
        ]
    counts = generate_examples_cocitabs_contexts(cocits, pid2abstract,
                                                 str(tmp_path))
    # 4 groups -> 80/20 split = 3 train + 1 dev, x3 combinations
    assert counts["train"] == 9 and counts["dev"] == 3
    train = [json.loads(l) for l in open(tmp_path / "train-concocitabs-seq.jsonl")]
    dev = [json.loads(l) for l in open(tmp_path / "dev-concocitabs-seq.jsonl")]
    for ex in train + dev:
        assert set(ex["query"]) == {"TITLE", "ABSTRACT"}
        assert "citing_contexts" in ex["pos_context"]
        assert "citing_pids" in ex["pos_context"]
        assert len(ex["pos_context"]["citing_contexts"]) == \
               len(ex["pos_context"]["citing_pids"]) == 2
        assert len(ex["cited_pids"]) == 3
        assert "citing_contexts" not in ex    # NOT at top level (vs cocitabs)
    for ex in dev:
        neg = ex["neg_context"]
        assert "citing_contexts" in neg and "citing_pids" in neg
    assert all("neg_context" not in ex for ex in train)


def test_coppsent_roundtrips_triplestream(tmp_path):
    """The raw-string sentence files feed TripleStream/dev_batches directly
    (the readers wrap bare strings into the abstract-dict contract)."""
    from aspire_tpu.data.readers import TripleStream, dev_batches
    from aspire_tpu.core.config import ModelHParams
    from transformers import BertTokenizer
    cocits_sent = {
        (f"x{i}", f"y{i}"): [(f"c{i}a", f"context alpha number {i}"),
                             (f"c{i}b", f"context beta number {i}"),
                             (f"c{i}c", f"context gamma number {i}")]
        for i in range(8)
    }
    generate_examples_sent_rand(cocits_sent, str(tmp_path))
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "context",
             "alpha", "beta", "gamma", "number"]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab))
    tok = BertTokenizer(str(tmp_path / "vocab.txt"))
    hp = ModelHParams(max_sents=4)
    stream = TripleStream(str(tmp_path / "train-coppsent.jsonl"), tok, hp,
                          micro_batch=2, n_micro=2, seq_len=32)
    batches = list(stream)
    assert batches, "train stream yielded no superbatches"
    b = batches[0]
    assert b["query"]["token_ids"].shape == (2, 2, 32)
    assert (b["query"]["abs_lens"] == 1).all()   # one sentence per example
    devs = list(dev_batches(str(tmp_path / "dev-coppsent.jsonl"), tok, hp,
                            batch_size=2, seq_len=32))
    assert devs and "neg" in devs[0]


def test_scidocs_converter(tmp_path):
    in_dir = tmp_path / "in"
    (in_dir / "cite").mkdir(parents=True)
    meta = {
        "q1": {"title": "T1", "abstract": "First sent. Second sent.", "year": 2019},
        "c1": {"title": "T2", "abstract": "Cand one text. More text.", "year": 2019},
        "c2": {"title": "T3", "abstract": "Cand two text here. Yes.", "year": 2020},
        "bad": {"title": None, "abstract": None, "year": 2020},
    }
    (in_dir / "paper_metadata_view_cite_read.json").write_text(json.dumps(meta))
    (in_dir / "cite" / "val.qrel").write_text("q1 0 c1 1\nq1 0 bad 1\n")
    (in_dir / "cite" / "test.qrel").write_text("q1 0 c2 0\n")
    out = scidocs_to_common(str(in_dir), str(tmp_path / "out"), "cite")
    assert out["queries"] == 1
    anns = json.loads((tmp_path / "out" / "test-pid2anns-scidcite.json").read_text())
    assert anns["q1"]["cands"] == ["c1", "c2"]
    assert anns["q1"]["relevance_adju"] == [1, 0]
    absf = [json.loads(l) for l in open(tmp_path / "out" / "abstracts-scidcite.jsonl")]
    assert {d["paper_id"] for d in absf} == {"q1", "c1", "c2"}


def test_treccovid_converter(tmp_path):
    in_dir = tmp_path / "tc"
    in_dir.mkdir()
    qrels = []
    docs = {}
    for t in range(4):
        for d in range(4):
            did = f"doc{t}_{d}"
            qrels.append(f"{t+1} 5 {did} 2")
            docs[did] = (f"Title {did}", f"Abstract sentence one for {did}. And two.")
    (in_dir / "qrels-covid_d5_j0.5-5.txt").write_text("\n".join(qrels) + "\n")
    import csv as _csv
    with open(in_dir / "metadata-2021-06-21.csv", "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=["cord_uid", "title", "abstract",
                                           "publish_time", "authors"])
        w.writeheader()
        for did, (t, a) in docs.items():
            w.writerow({"cord_uid": did, "title": t, "abstract": a,
                        "publish_time": "2020-01-01", "authors": "A"})
    out = treccovid_to_common(str(in_dir), str(tmp_path / "out"))
    assert out["papers"] == 16 and out["topics"] == 4
    anns = json.loads((tmp_path / "out" / "test-pid2anns-treccovid.json").read_text())
    q, info = next(iter(anns.items()))
    # 3 same-topic positives + 12 other-topic negatives
    assert info["relevance_adju"].count(2) == 3
    assert info["relevance_adju"].count(0) == 12
    splits = json.loads((tmp_path / "out" / "treccovid-evaluation_splits.json").read_text())
    assert set(splits["dev"]).isdisjoint(splits["test"])
