"""GORC mining tests: citation-context extraction and co-citation grouping."""
import json

from aspire_tpu.data.gorc import (
    extract_citation_contexts, gather_cocitations, filter_corpus_abstracts,
)


def make_paper():
    return {
        "paper_id": "citing1",
        "grobid_parse": {
            "bib_entries": {
                "b0": {"links": "pA"},
                "b1": {"links": "pB"},
                "b2": {"links": None},
                "b3": {"links": "pC"},
            },
            "body_text": [
                {"text": "We build on [1] and [2] for this. Separately we use [4].",
                 "cite_spans": [
                     {"start": 12, "end": 15, "ref_id": "b0"},
                     {"start": 20, "end": 23, "ref_id": "b1"},
                     {"start": 52, "end": 55, "ref_id": "b3"},
                     {"start": 0, "end": 2, "ref_id": "b2"},
                 ]},
            ],
        },
    }


def test_extract_contexts():
    ctx = extract_citation_contexts(make_paper())
    # pA and pB cited in sentence 0; pC in sentence 1; unlinked b2 dropped
    assert set(ctx) == {"pA", "pB", "pC"}
    assert ctx["pA"][0][1] == 0 and ctx["pB"][0][1] == 0
    assert ctx["pC"][0][1] == 1


def test_gather_cocitations():
    ctx = extract_citation_contexts(make_paper())
    line = json.dumps({"citing1": ctx})
    cocited, single = gather_cocitations([line])
    assert ("pA", "pB") in cocited
    citing, sent = cocited[("pA", "pB")][0]
    assert citing == "citing1" and "[1]" in sent
    assert ("pC",) in single


def test_filter_corpus_abstracts():
    good = {"paper_id": "g", "title": "T",
            "abstract": ["one two three four five."] * 5}
    bad = {"paper_id": "b", "title": "T", "abstract": ["too short."]}
    out = filter_corpus_abstracts([good, bad])
    assert set(out) == {"g"}


def test_gather_papers_and_area_filter(tmp_path):
    import json
    b1 = tmp_path / "b1.jsonl"
    b1.write_text("\n".join(json.dumps({"paper_id": i, "title": f"t{i}"})
                            for i in range(5)) + "\n")
    from aspire_tpu.data.gorc import gather_papers, filter_area_citcontexts
    got = gather_papers({"1", "3"}, [str(b1)])
    assert set(got) == {"1", "3"} and got["3"]["title"] == "t3"

    lines = [json.dumps({"p1": {"pA": [[0, 0, "s1"]]}}),
             json.dumps({"p2": {"pB": [[0, 0, "s2"]]}})]
    kept = list(filter_area_citcontexts(lines, {"p1": "compsci", "p2": "biomed"},
                                        "compsci"))
    assert len(kept) == 1 and "p1" in kept[0]
