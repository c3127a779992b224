"""End-to-end S2ORC-scale preprocessing driver on a synthetic 10-file corpus.

Exercises the full reference chain in one command (pre_proc_gorc.py
filter_metadata -> citation contexts -> gather_cocitations ->
pre_proc_cocits.py filtering -> co-cited abstract examples) including the
multi-process stage-1 fan-out over batch files (data_utils.DirMetaIterator +
mp.Pool.imap_unordered pattern).
"""
import json
import gzip

import pytest

from aspire_tpu.data.corpus import (run_gorc_pipeline, list_batch_files,
                                    process_batch_file)


def make_abstract(seed: int) -> list[str]:
    # 4 sentences x 7 words: passes the 3-20 sents / 4-80 toks noise filter
    return [f"Sentence {seed} {i} about methods results and data."
            for i in range(4)]


def cited_paper(pid: str) -> dict:
    return {"paper_id": pid, "title": f"cited paper {pid}",
            "abstract": " ".join(make_abstract(hash(pid) % 100))}


def citing_paper(pid: str, cited_a: str, cited_b: str, flavor: int) -> dict:
    text = (f"We build on the prior systems [1] and [2] for flavor {flavor}. "
            "A second sentence without any citations follows here.")
    start = text.index("[1]")
    start2 = text.index("[2]")
    return {
        "paper_id": pid, "title": f"citing paper {pid}",
        "abstract": " ".join(make_abstract(flavor)),
        "has_grobid": True,
        "grobid_parse": {
            "bib_entries": {"BIBREF0": {"links": cited_a},
                            "BIBREF1": {"links": cited_b}},
            "body_text": [{
                "text": text,
                "cite_spans": [
                    {"start": start, "end": start + 3, "ref_id": "BIBREF0"},
                    {"start": start2, "end": start2 + 3, "ref_id": "BIBREF1"},
                ],
            }],
        },
    }


@pytest.fixture
def corpus_dir(tmp_path):
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    # 12 cited papers spread over the batches; 10 batch files, each with one
    # or two citing papers co-citing a fixed pair -> >=6 co-cited sets with
    # multiple contexts each
    pairs = [(f"c{2 * i}", f"c{2 * i + 1}") for i in range(6)]
    for b in range(10):
        papers = []
        a, c = pairs[b % 6]
        papers.append(citing_paper(f"p{b}a", a, c, flavor=b))
        papers.append(citing_paper(f"p{b}b", a, c, flavor=100 + b))
        for ci in range(12):
            if ci % 10 == b:
                papers.append(cited_paper(f"c{ci}"))
        if b < 2:  # also include the tail cited papers
            papers.append(cited_paper(f"c{10 + b}"))
        lines = "\n".join(json.dumps(p) for p in papers) + "\n"
        if b % 2 == 0:  # half the batches gzipped (S2ORC ships .jsonl.gz)
            with gzip.open(corpus / f"{b}.jsonl.gz", "wt") as f:
                f.write(lines)
        else:
            (corpus / f"{b}.jsonl").write_text(lines)
    return corpus


def test_batch_file_listing_and_worker(corpus_dir, tmp_path):
    files = list_batch_files(str(corpus_dir))
    assert len(files) == 10
    out = tmp_path / "out1"
    out.mkdir()
    res = process_batch_file((files[0], str(out)))
    assert res["papers"] >= 3 and res["contexts"] == 2 and res["abstracts"] >= 3


def test_gorc_pipeline_end_to_end_multiprocess(corpus_dir, tmp_path):
    out = tmp_path / "out"
    summary = run_gorc_pipeline(str(corpus_dir), str(out), processes=2,
                                train_size=100, dev_size=100)
    assert summary["batch_files"] == 10
    assert summary["cocited_sets"] == 6
    assert summary["filtered_sets"] == 6
    assert summary["abstracts"] >= 12
    # train + dev jsonl exist with the reference example schema
    n_train = 0
    with open(out / "train-cocitabs.jsonl") as f:
        for line in f:
            ex = json.loads(line)
            assert {"query", "pos_context", "citing_contexts",
                    "cited_pids"} <= set(ex)
            assert len(ex["query"]["ABSTRACT"]) == 4
            n_train += 1
    assert n_train + summary["examples"]["dev"] == 6  # one pair per cocit set
    assert (out / "cocitpids2contexts-all.pickle").exists()
    assert (out / "gorc-summary.json").exists()


def test_gorc_pipeline_area_filter(corpus_dir, tmp_path):
    # restrict to an area containing only half the citing papers
    pid2area = {f"p{b}a": "compsci" for b in range(10)}
    pid2area.update({f"p{b}b": "biomed" for b in range(10)})
    out = tmp_path / "out_area"
    summary = run_gorc_pipeline(str(corpus_dir), str(out), processes=1,
                                area="compsci", pid2area=pid2area,
                                train_size=100, dev_size=100)
    assert summary["cocited_sets"] == 6  # same sets, fewer contexts
    with open(out / "gorc-summary.json") as f:
        assert json.load(f)["filtered_sets"] == 6
