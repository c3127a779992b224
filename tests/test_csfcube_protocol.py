"""Full CSFCube faceted-protocol end-to-end test.

Builds a synthetic dataset in the CSFCube file layout whose query pids are
the REAL fold query ids (evaluation/csfcube_folds.json), with facet-labelled
sentences and planted near-copy relevant candidates, then runs the complete
encode -> faceted score -> 2-fold cross-val evaluate pipeline.
"""
import json
import numpy as np
import jax
import pytest
from transformers import BertTokenizer

from aspire_tpu.evaluation.protocols import load_csfcube_folds
from aspire_tpu.evaluation.datasets import EvalDataset, FACETS
from aspire_tpu.evaluation.models import AspireSimilarityModel
from aspire_tpu.evaluation.evaluate import run_evaluation
from aspire_tpu.models.bert import BertConfig
from aspire_tpu.models.encoders import ConSentEncoder

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "title"] + WORDS
    p = tmp_path_factory.mktemp("vb") / "vocab.txt"
    p.write_text("\n".join(vocab) + "\n")
    return BertTokenizer(str(p), do_lower_case=True)


def build_csfcube_like(root, rng):
    folds = load_csfcube_folds()
    facet_qpids = {f: sorted({q.rsplit("_", 1)[0]
                              for fold in folds[f].values() for q in fold})
                   for f in FACETS}
    labels = ["background_label", "method_label", "result_label"]
    papers, anns = {}, {f: {} for f in FACETS}
    for facet_i, facet in enumerate(FACETS):
        for qpid in facet_qpids[facet]:
            if qpid not in papers:
                sents = [" ".join(rng.choice(WORDS, 4)) for _ in range(3)]
                papers[qpid] = {"title": "title q", "abstract": sents,
                                "pred_labels": labels}
            qsents = papers[qpid]["abstract"]
            cands, rels = [], []
            for ci in range(8):
                cpid = f"{qpid}{facet[0]}c{ci}"
                if ci < 2:  # relevant: full near-copy of the query abstract
                    # (the encoder is contextual -- the facet sentence only
                    # matches tightly in an identical context)
                    papers[cpid] = {"title": "title q",
                                    "abstract": list(qsents),
                                    "pred_labels": labels}
                    rels.append(2)
                else:
                    papers[cpid] = {"title": "title x",
                                    "abstract": [" ".join(rng.choice(WORDS, 4))
                                                 for _ in range(2)],
                                    "pred_labels": labels[:1] * 2}
                    rels.append(0)
                cands.append(cpid)
            anns[facet][qpid] = {"cands": cands, "relevance_adju": rels}
    with open(root / "abstracts-csfcube.jsonl", "w") as f:
        for pid, p in papers.items():
            f.write(json.dumps({"paper_id": pid, **p}) + "\n")
    for facet in FACETS:
        with open(root / f"test-pid2anns-csfcube-{facet}.json", "w") as f:
            json.dump(anns[facet], f)


def test_csfcube_faceted_pipeline(tmp_path, tok, rng):
    build_csfcube_like(tmp_path, rng)
    ds = EvalDataset("csfcube", str(tmp_path))
    cfg = BertConfig.tiny()
    params = ConSentEncoder(cfg, max_sents=6).init(
        jax.random.key(0), *(np.zeros((1, 8), np.int32),) * 3)["params"]
    model = AspireSimilarityModel(name="m", bert_config=cfg, params=params,
                                  tokenizer=tok, agg="l2max", max_sents=6)
    out = run_evaluation(model, ds, str(tmp_path / "res"),
                         cache_path=str(tmp_path / "enc.h5"))
    # relevant candidates are exact copies of the facet sentence; faceted
    # query encoding keeps only that sentence -> they must rank top.
    for facet in FACETS:
        for split in ("dev", "test"):
            m = out[facet][split]
            assert m["mean_av_precision"] > 0.99, (facet, split, m)
    # the 'all' aggregate exists and is aggregated over the union folds
    assert out["all"]["test"]["mean_av_precision"] > 0.99
    # artifacts per facet
    import os
    for facet in FACETS:
        assert os.path.exists(tmp_path / "res" / f"scores-{facet}.json")
        assert os.path.exists(tmp_path / "res" / f"aggregated-evaluations-{facet}.csv")
