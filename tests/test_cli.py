"""CLI smoke tests: real subprocess invocations of python -m aspire_tpu."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]

ENV = {**os.environ,
       "JAX_PLATFORMS": "cpu",
       "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
       "JAX_PLATFORM_NAME": "cpu"}


def run_cli(args, cwd):
    # sitecustomize-free invocation; force CPU inside the subprocess
    code = ("import jax; jax.config.update('jax_platforms','cpu');"
            "from aspire_tpu.cli import main; main(%r)" % (args,))
    return subprocess.run([sys.executable, "-c", code], cwd=cwd, env=ENV,
                          capture_output=True, text=True, timeout=900)


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("vb")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "title"] + WORDS
    (d / "vocab.txt").write_text("\n".join(vocab) + "\n")
    (d / "tokenizer_config.json").write_text(json.dumps(
        {"tokenizer_class": "BertTokenizer", "do_lower_case": True}))
    return str(d)


def write_train_files(root, rng, n=24):
    def doc():
        return {"TITLE": "title", "ABSTRACT": [
            " ".join(rng.choice(WORDS, 4)) for _ in range(int(rng.integers(1, 4)))]}
    with open(root / "train.jsonl", "w") as f:
        for _ in range(n):
            f.write(json.dumps({"query": doc(), "pos_context": doc()}) + "\n")
    with open(root / "dev.jsonl", "w") as f:
        for _ in range(8):
            f.write(json.dumps({"query": doc(), "pos_context": doc(),
                                "neg_context": doc()}) + "\n")


def test_cli_train_and_evaluate(tmp_path, rng, vocab_dir):
    write_train_files(tmp_path, rng)
    cfg = {"model_name": "miswordbienc", "score_aggregation": "l2max",
           "train_size": 24, "dev_size": 8, "batch_size": 8,
           "accumulated_batch_size": -1, "num_epochs": 1,
           "learning_rate": 1e-4, "num_warmup_steps": 2,
           "lr_decay_method": "warmuplin", "es_check_every": 2,
           "max_sents": 4, "update_rule": "adam", "decay_lr_every": 1,
           "base-pt-layer": vocab_dir}
    (tmp_path / "cfg.json").write_text(json.dumps(cfg))
    run_dir = tmp_path / "run"
    r = run_cli(["train", "--config", str(tmp_path / "cfg.json"),
                 "--train", str(tmp_path / "train.jsonl"),
                 "--dev", str(tmp_path / "dev.jsonl"),
                 "--out", str(run_dir), "--tokenizer", vocab_dir,
                 "--tiny", "--seq-len", "32"], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-3000:]
    assert (run_dir / "run_info.json").exists()
    assert (run_dir / "model_cur_best").exists()

    # build a toy eval dataset and evaluate with the trained model
    from tests_evalds import make_eval_dataset
    make_eval_dataset(tmp_path, rng, WORDS)
    r2 = run_cli(["evaluate", "--dataset", "toy", "--dataset-dir", str(tmp_path),
                  "--model", "miswordbienc", "--run-dir", str(run_dir),
                  "--tokenizer", vocab_dir,
                  "--results", str(tmp_path / "res"),
                  "--cache", str(tmp_path / "enc.h5")], cwd=str(tmp_path))
    assert r2.returncode == 0, r2.stderr[-3000:]
    out = json.loads(r2.stdout[r2.stdout.index("{"):])
    assert "all" in out
    assert (tmp_path / "res" / "aggregated-evaluations.csv").exists()
