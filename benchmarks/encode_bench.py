"""Corpus-encode benchmark (BASELINE config #4: 100k-abstract index build).

Measures ConSentEncoder forward throughput at BERT-base scale in bf16 --
the encode stage of `aspire_tpu build-index` -- on one chip, plus the
projected wall time for a 100k/1M corpus.

Run: python benchmarks/encode_bench.py [--batch 64] [--seq 256]
"""
import argparse
import json
import pathlib
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).parent))
from timing import timed_loop

from aspire_tpu.models.bert import BertConfig
from aspire_tpu.models.encoders import ConSentEncoder


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=256)
    args = ap.parse_args()

    cfg = BertConfig()
    smax = 20
    enc = ConSentEncoder(cfg, max_sents=smax, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    b, t = args.batch, args.seq
    token_ids = jnp.asarray(rng.integers(5, cfg.vocab_size, (b, t)), jnp.int32)
    attn = jnp.ones((b, t), jnp.int32)
    sent_ids = jnp.asarray(np.clip(rng.integers(-1, smax, (b, t)), -1, smax - 1),
                           jnp.int32)
    params = enc.init(jax.random.key(0), token_ids, attn, sent_ids)["params"]

    def scale_word_emb(params, eps):
        # serialize through a FLOAT input: int-input serialization
        # (token_ids + acc*0) is provably identity so XLA hoists the whole
        # loop-invariant forward, and a cls[0, 0] readout lets DCE prune
        # the other batch rows (see enc_check.py / RESULTS_r4 measurement
        # correction).  Costs one [vocab, h] read+write per iteration.
        emb = dict(params["bert"]["embeddings"])
        we = dict(emb["word_embeddings"])
        we["embedding"] = we["embedding"] * eps
        bert = dict(params["bert"], embeddings=dict(emb, word_embeddings=we))
        return dict(params, bert=bert)

    def one(acc, params, token_ids, attn, sent_ids):
        cls, sents = enc.apply({"params": scale_word_emb(params, 1.0 + acc * 0.0)},
                               token_ids, attn, sent_ids)
        return (jnp.sum(cls) + jnp.sum(sents)).astype(jnp.float32)

    dt = timed_loop(one, 50, params, token_ids, attn, sent_ids)
    rate = b / dt
    print(json.dumps({
        "metric": "encode_docs_per_sec_per_chip",
        "batch": b, "seq_len": t, "value": round(rate, 1), "unit": "docs/s",
        "corpus_100k_minutes": round(100_000 / rate / 60, 2),
        "corpus_1m_minutes_v5e8": round(1_000_000 / rate / 60 / 8, 2),
    }))


if __name__ == "__main__":
    main()
