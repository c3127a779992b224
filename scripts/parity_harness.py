#!/usr/bin/env python
"""Real-weights parity harness: reference (CPU torch) vs aspire_tpu.

One command, two stages, each using the ACTUAL reference code at
--ref-root as the oracle (nothing re-implemented here):

  1. ENCODING PARITY (always runs; needs only torch+transformers): encode a
     sample of dataset abstracts with the reference's AspireConSent
     (examples/ex_aspire_consent.py:25-101, incl. its prepare_abstracts
     tokenization contract) and with aspire_tpu's ConSentEncoder from the
     SAME local checkpoint dir; report per-sentence max-abs / cosine gaps.
  2. FULL EVAL PARITY (runs when `geomloss` is importable -- the reference's
     OT scorer, src/evaluation/utils/models.py:190-197, hard-requires it):
     run reference evaluate.py and `aspire_tpu evaluate` end-to-end and diff
     per-query MAP / NDCG%20.

Usage (the moment an allenai/aspire-* checkpoint dir is available):

  python scripts/parity_harness.py \
      --weights-dir /path/to/aspire-contextualsentence-multim-compsci \
      --dataset csfcube --dataset-dir /path/to/csfcube \
      --out /tmp/parity [--facet all] [--n-encode 32]
"""
from __future__ import annotations

import argparse
import importlib.util
import json
import os
import pathlib
import subprocess
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]

_REF_ENCODE_DRIVER = r"""
import json, sys
import numpy as np
import torch
ref_root, weights_dir, in_json, out_npz = sys.argv[1:5]
sys.path.insert(0, ref_root)
sys.path.insert(0, ref_root + "/examples")
from ex_aspire_consent import AspireConSent, prepare_abstracts
from transformers import AutoTokenizer
papers = json.load(open(in_json))
tok = AutoTokenizer.from_pretrained(weights_dir)
model = AspireConSent(weights_dir)
model.eval()
out = {}
for i, paper in enumerate(papers):  # one at a time: no cross-paper padding
    bert_batch, abs_lens, sent_token_idxs = prepare_abstracts(
        batch_abs=[paper], pt_lm_tokenizer=tok)
    with torch.no_grad():
        _, sent_reps = model.forward(bert_batch, abs_lens, sent_token_idxs)
    out[str(i)] = sent_reps[0, : abs_lens[0]].numpy()
np.savez(out_npz, **out)
"""

_REF_EVAL_DRIVER = r"""
import sys, types
ref_root, weights_dir, dataset, dataset_dir, results_dir, facet, model_name = sys.argv[1:8]
sys.path.insert(0, ref_root)
sys.path.insert(0, ref_root + "/examples")
from src.evaluation.utils import models as ref_models
# point the hub names at the local checkpoint dir (zero-egress)
ref_models.AspireModel.MODEL_PATHS = {k: weights_dir
                                      for k in ref_models.AspireModel.MODEL_PATHS}
from src.evaluation import evaluate as ref_evaluate
args = types.SimpleNamespace(
    model_name=model_name, dataset_name=dataset, dataset_dir=dataset_dir,
    results_dir=results_dir, facet=(facet or None), cache=True, run_name=None,
    trained_model_path=None, log_fname=None,
    actions=["encode", "score", "evaluate"])
ref_evaluate.main(args)
"""


def run_encoding_parity(a) -> dict:
    """Stage 1: reference AspireConSent vs aspire_tpu ConSentEncoder."""
    from aspire_tpu.evaluation.datasets import EvalDataset
    from aspire_tpu.evaluation.models import AspireSimilarityModel

    out = pathlib.Path(a.out)
    out.mkdir(parents=True, exist_ok=True)
    ds = EvalDataset(a.dataset, a.dataset_dir)
    pids = sorted(ds.dataset)[: a.n_encode]
    papers = [{"TITLE": ds.get(p)["TITLE"], "ABSTRACT": ds.get(p)["ABSTRACT"]}
              for p in pids]
    in_json = out / "parity-sample.json"
    in_json.write_text(json.dumps(papers))
    ref_npz = out / "ref-sent-reps.npz"
    subprocess.run([sys.executable, "-c", _REF_ENCODE_DRIVER, a.ref_root,
                    a.weights_dir, str(in_json), str(ref_npz)], check=True)
    ref = np.load(ref_npz)

    model = AspireSimilarityModel.from_hf_dir("parity", a.weights_dir, agg="ot")
    mine = model.encode(papers)
    gaps = []
    for i in range(len(papers)):
        r, m = ref[str(i)], np.asarray(mine[i])
        assert r.shape == m.shape, (
            f"doc {i}: sentence-count/shape mismatch {r.shape} vs {m.shape} "
            "(tokenization contract broken)")
        denom = np.linalg.norm(r, axis=1) * np.linalg.norm(m, axis=1)
        cos = np.sum(r * m, axis=1) / np.maximum(denom, 1e-12)
        gaps.append({"doc": i, "max_abs": float(np.abs(r - m).max()),
                     "min_cos": float(cos.min())})
    worst = {"max_abs": max(g["max_abs"] for g in gaps),
             "min_cos": min(g["min_cos"] for g in gaps)}
    report = {"stage": "encoding-parity", "n_docs": len(papers), **worst,
              "per_doc": gaps}
    (out / "encoding-parity.json").write_text(json.dumps(report, indent=2))
    print(f"[encoding-parity] {len(papers)} docs: "
          f"max_abs={worst['max_abs']:.3e} min_cos={worst['min_cos']:.6f}")
    return report


def run_eval_parity(a) -> dict | None:
    """Stage 2: full evaluate.py vs `aspire_tpu evaluate`, per-query diff."""
    if importlib.util.find_spec("geomloss") is None:
        print("[eval-parity] SKIPPED: the reference OT scorer requires "
              "`geomloss` (src/evaluation/utils/models.py:190-197), which is "
              "not installed.  Encoding parity above still validates the "
              "weights + tokenization contract; install geomloss 0.2.4 to "
              "run the full per-query MAP/NDCG diff.")
        return None
    import pandas as pd

    out = pathlib.Path(a.out)
    ref_results = out / "ref-results"
    my_results = out / "tpu-results"
    subprocess.run([sys.executable, "-c", _REF_EVAL_DRIVER, a.ref_root,
                    a.weights_dir, a.dataset, a.dataset_dir, str(ref_results),
                    a.facet or "", a.model_name], check=True)
    from aspire_tpu.cli import main as tpu_main
    argv = ["evaluate", "--dataset", a.dataset, "--dataset-dir", a.dataset_dir,
            "--model", a.model_name, "--results", str(my_results),
            "--weights-dir", a.weights_dir]
    if a.facet:
        argv += ["--facet", a.facet]
    tpu_main(argv)

    def find_query_csv(root):
        hits = sorted(pathlib.Path(root).rglob("*query-evaluations.csv"))
        assert hits, f"no query-evaluations.csv under {root}"
        return hits

    diffs = {}
    for ref_csv in find_query_csv(ref_results):
        my_hits = find_query_csv(my_results)
        my_csv = my_hits[0] if len(my_hits) == 1 else next(
            h for h in my_hits if h.name == ref_csv.name)
        r = pd.read_csv(ref_csv, index_col=0)
        m = pd.read_csv(my_csv, index_col=0)
        joined = r.join(m, lsuffix="_ref", rsuffix="_tpu", how="inner")
        for metric in ("av_precision", "ndcg%20", "ndcg_%20"):
            if f"{metric}_ref" in joined:
                d = (joined[f"{metric}_ref"] - joined[f"{metric}_tpu"]).abs()
                diffs[f"{ref_csv.name}:{metric}"] = {
                    "mean_ref": float(joined[f"{metric}_ref"].mean()),
                    "mean_tpu": float(joined[f"{metric}_tpu"].mean()),
                    "max_query_absdiff": float(d.max()),
                }
    report = {"stage": "eval-parity", "diffs": diffs}
    (out / "eval-parity.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--weights-dir", required=True,
                   help="local HF checkpoint dir (allenai/aspire-* clone)")
    p.add_argument("--dataset", default="csfcube")
    p.add_argument("--dataset-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--facet", default=None)
    p.add_argument("--model-name", default="aspire_compsci")
    p.add_argument("--ref-root", default="/root/reference")
    p.add_argument("--n-encode", type=int, default=32,
                   help="sample size for the encoding-parity stage")
    p.add_argument("--skip-eval", action="store_true")
    a = p.parse_args(argv)
    run_encoding_parity(a)
    if not a.skip_eval:
        run_eval_parity(a)


if __name__ == "__main__":
    main()
