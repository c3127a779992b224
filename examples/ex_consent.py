"""Example: tsAspire contextual-sentence encoding + single-match scoring.

Equivalent of the reference examples/ex_aspire_consent.py: encode a pair of
abstracts into per-sentence multi-vectors and score them with the masked
all-pair L2 max-sim (tsAspire).

Zero-egress note: pass a LOCAL directory containing the HF checkpoint
(config.json + pytorch weights + vocab) as --weights-dir, e.g. a download of
allenai/aspire-contextualsentence-singlem-compsci.  With no weights dir the
example runs a randomly initialized tiny encoder end-to-end.
"""
import argparse

import numpy as np
import jax
import jax.numpy as jnp

from aspire_tpu.core.types import MultiVec
from aspire_tpu.models.bert import BertConfig
from aspire_tpu.models.encoders import ConSentEncoder
from aspire_tpu.ops.distances import l2max_dist
from aspire_tpu.text.tokenize import prepare_abstracts

EX_ABSTRACTS = [
    {"TITLE": "Multi-Vector Models with Textual Guidance for Fine-Grained "
              "Scientific Document Similarity",
     "ABSTRACT": ["We present a new scientific document similarity model "
                  "based on matching fine-grained aspects.",
                  "Our model is trained using co-citation contexts as "
                  "textual supervision.",
                  "Matching is computed over contextual sentence embeddings."]},
    {"TITLE": "CSFCube: A Test Collection of Computer Science Papers",
     "ABSTRACT": ["We introduce a test collection for faceted query by "
                  "example retrieval.",
                  "Queries specify the facet of similarity to retrieve by.",
                  "We analyze a range of models on this task."]},
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights-dir", help="local HF aspire checkpoint dir")
    args = ap.parse_args()

    if args.weights_dir:
        import transformers
        from aspire_tpu.models.convert import params_from_hf_model, config_from_hf
        hf = transformers.AutoModel.from_pretrained(args.weights_dir)
        tokenizer = transformers.AutoTokenizer.from_pretrained(args.weights_dir)
        cfg = config_from_hf(hf.config)
        params = {"bert": params_from_hf_model(hf, cfg)}
    else:
        print("no --weights-dir: using a random tiny encoder (demo only)")
        from transformers import BertTokenizer
        import tempfile, os
        cfg = BertConfig.tiny(vocab_size=30522)
        d = tempfile.mkdtemp()
        words = sorted({w.lower().strip(".,")
                        for ex in EX_ABSTRACTS
                        for s in [ex["TITLE"]] + ex["ABSTRACT"] for w in s.split()})
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words
        with open(os.path.join(d, "vocab.txt"), "w") as f:
            f.write("\n".join(vocab))
        tokenizer = BertTokenizer(os.path.join(d, "vocab.txt"))
        enc0 = ConSentEncoder(cfg, max_sents=10)
        params = enc0.init(jax.random.key(0), *(jnp.zeros((1, 8), jnp.int32),) * 3)["params"]

    encoder = ConSentEncoder(cfg, max_sents=10)
    fb = prepare_abstracts(EX_ABSTRACTS, tokenizer, max_sents=10)

    # params as a jit ARGUMENT (a closure would bake 440 MB of weights into
    # the compiled program with real checkpoints)
    @jax.jit
    def encode(params, token_ids, attn_mask, sent_ids):
        return encoder.apply({"params": params}, token_ids, attn_mask, sent_ids)

    cls, sents = encode(params, jnp.asarray(fb.token_ids),
                        jnp.asarray(fb.attn_mask), jnp.asarray(fb.sent_ids))
    print("doc CLS reps:", cls.shape, " sentence reps:", sents.shape)

    q = MultiVec(embed=sents[:1], lens=jnp.asarray(fb.abs_lens[:1]))
    c = MultiVec(embed=sents[1:], lens=jnp.asarray(fb.abs_lens[1:]))
    score = jax.jit(lambda q, c: l2max_dist(q, c, return_pair_sims=True))
    sims, pair_sims = score(q, c)
    print("tsAspire similarity:", float(sims[0]))
    ql, cl = int(fb.abs_lens[0]), int(fb.abs_lens[1])
    best = np.unravel_index(np.asarray(pair_sims)[0, :ql, :cl].argmax(), (ql, cl))
    print(f"best-matching sentence pair: query sent {best[0]} <-> cand sent {best[1]}")


if __name__ == "__main__":
    main()
