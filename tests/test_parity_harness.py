"""Run the real-weights parity harness against the ACTUAL reference code.

The encoding-parity stage executes /root/reference's AspireConSent +
prepare_abstracts (torch) as the oracle with a tiny random local checkpoint,
and requires aspire_tpu's encoder to reproduce the per-sentence reps.  This
is the strongest no-weights-needed parity gate: it covers the HF conversion,
the sent_tok_idxs tokenization contract, and the pooling semantics end to
end.  (The full-eval stage needs geomloss and auto-skips without it.)
"""
import json
import pathlib
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
REF_ROOT = pathlib.Path("/root/reference")

sys.path.insert(0, str(REPO / "scripts"))

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa", "lamda", "mu"]


@pytest.fixture(scope="module")
def weights_dir(tmp_path_factory):
    """Tiny random BERT checkpoint + WordPiece vocab saved as an HF dir."""
    import torch
    import transformers
    d = tmp_path_factory.mktemp("ckpt")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "title"] + WORDS
    (d / "vocab.txt").write_text("\n".join(vocab) + "\n")
    tok = transformers.BertTokenizer(str(d / "vocab.txt"), do_lower_case=True)
    # the reference hardcodes bert_encoding_dim=768 (ex_aspire_consent.py:31)
    # so the tiny checkpoint keeps hidden_size=768 with few/small layers
    cfg = transformers.BertConfig(
        vocab_size=tok.vocab_size, hidden_size=768, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=512)
    torch.manual_seed(0)
    hf = transformers.BertModel(cfg).eval()
    hf.save_pretrained(d)
    tok.save_pretrained(d)
    return str(d)


@pytest.fixture
def dataset_dir(tmp_path, rng):
    papers = {}
    for i in range(6):
        papers[f"q{i}"] = {
            "title": "title " + " ".join(rng.choice(WORDS, 3)),
            "abstract": [" ".join(rng.choice(WORDS, 5)) + "."
                         for _ in range(int(rng.integers(2, 6)))],
        }
    with open(tmp_path / "abstracts-toy.jsonl", "w") as f:
        for pid, p in papers.items():
            f.write(json.dumps({"paper_id": pid, **p}) + "\n")
    return str(tmp_path)


@pytest.mark.skipif(not REF_ROOT.exists(), reason="reference not present")
def test_encoding_parity_vs_reference(weights_dir, dataset_dir, tmp_path):
    import parity_harness as ph

    a = ph.main.__wrapped__ if hasattr(ph.main, "__wrapped__") else None
    report = ph.run_encoding_parity(type("A", (), {
        "weights_dir": weights_dir, "dataset": "toy",
        "dataset_dir": dataset_dir, "out": str(tmp_path / "parity"),
        "facet": None, "model_name": "aspire_compsci",
        "ref_root": str(REF_ROOT), "n_encode": 6})())
    assert report["n_docs"] == 6
    # same weights, same tokenization contract, same pooling -> tight parity
    assert report["max_abs"] < 5e-4, report
    assert report["min_cos"] > 0.99999, report
    assert (tmp_path / "parity" / "encoding-parity.json").exists()


@pytest.mark.skipif(not REF_ROOT.exists(), reason="reference not present")
def test_eval_parity_skips_cleanly_without_geomloss(weights_dir, dataset_dir,
                                                    tmp_path, capsys):
    import importlib.util
    import parity_harness as ph
    if importlib.util.find_spec("geomloss") is not None:
        pytest.skip("geomloss present; the skip path is not reachable")
    out = ph.run_eval_parity(type("A", (), {
        "weights_dir": weights_dir, "dataset": "toy",
        "dataset_dir": dataset_dir, "out": str(tmp_path / "parity"),
        "facet": None, "model_name": "aspire_compsci",
        "ref_root": str(REF_ROOT), "n_encode": 6})())
    assert out is None
    assert "geomloss" in capsys.readouterr().out
