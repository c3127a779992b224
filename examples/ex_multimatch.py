"""Example: otAspire multi-match scoring with the Sinkhorn transport plan.

Equivalent of the reference examples/ex_aspire_consent_multimatch.py: encode
two abstracts, solve entropy-regularized OT between their sentence sets, and
inspect the transport plan (which sentence pairs carry similarity mass).
"""
import argparse

import numpy as np
import jax
import jax.numpy as jnp

from aspire_tpu.core.types import MultiVec
from aspire_tpu.ops.distances import wasserstein_dist
from ex_consent import EX_ABSTRACTS  # reuse the demo setup


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights-dir")
    args = ap.parse_args()

    # Reuse ex_consent's encoder setup by importing its main pieces.
    import ex_consent
    import sys
    sys.argv = ["ex_consent"] + (["--weights-dir", args.weights_dir]
                                 if args.weights_dir else [])
    # inline: build encoder exactly as ex_consent does
    from aspire_tpu.text.tokenize import prepare_abstracts
    from aspire_tpu.models.bert import BertConfig
    from aspire_tpu.models.encoders import ConSentEncoder
    if args.weights_dir:
        import transformers
        from aspire_tpu.models.convert import params_from_hf_model, config_from_hf
        hf = transformers.AutoModel.from_pretrained(args.weights_dir)
        tokenizer = transformers.AutoTokenizer.from_pretrained(args.weights_dir)
        cfg = config_from_hf(hf.config)
        params = {"bert": params_from_hf_model(hf, cfg)}
    else:
        from transformers import BertTokenizer
        import tempfile, os
        cfg = BertConfig.tiny(vocab_size=30522)
        d = tempfile.mkdtemp()
        words = sorted({w.lower().strip(".,")
                        for ex in EX_ABSTRACTS
                        for s in [ex["TITLE"]] + ex["ABSTRACT"] for w in s.split()})
        with open(os.path.join(d, "vocab.txt"), "w") as f:
            f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words))
        tokenizer = BertTokenizer(os.path.join(d, "vocab.txt"))
        enc0 = ConSentEncoder(cfg, max_sents=10)
        params = enc0.init(jax.random.key(0), *(jnp.zeros((1, 8), jnp.int32),) * 3)["params"]

    encoder = ConSentEncoder(cfg, max_sents=10)
    fb = prepare_abstracts(EX_ABSTRACTS, tokenizer, max_sents=10)
    cls, sents = jax.jit(lambda p, t, a, s: encoder.apply({"params": p}, t, a, s))(
        params, jnp.asarray(fb.token_ids), jnp.asarray(fb.attn_mask),
        jnp.asarray(fb.sent_ids))

    q = MultiVec(embed=sents[:1], lens=jnp.asarray(fb.abs_lens[:1]))
    c = MultiVec(embed=sents[1:], lens=jnp.asarray(fb.abs_lens[1:]))
    # jit: eager op dispatch is very slow on tunneled TPU backends
    score = jax.jit(lambda q, c: wasserstein_dist(q, c, temp=5000.0,
                                                  return_pair_sims=True))
    sims, (a, b, pair_sims, plan, masked) = score(q, c)
    ql, cl = int(fb.abs_lens[0]), int(fb.abs_lens[1])
    print("otAspire similarity:", float(sims[0]))
    print("transport plan (query sents x cand sents):")
    print(np.round(np.asarray(plan)[0, :ql, :cl], 4))


if __name__ == "__main__":
    main()
