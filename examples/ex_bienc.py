"""Example: SPECTER-CoCite bi-encoder (CLS rep with softmax layer mix).

Equivalent of the reference examples/ex_aspire_bienc.py: encode abstracts to
single CLS vectors via the scalar mix over all 13 hidden-state layers and
compare with -L2 distance.
"""
import argparse

import numpy as np
import jax
import jax.numpy as jnp

from aspire_tpu.models.bert import BertConfig
from aspire_tpu.models.encoders import BiEncoder
from ex_consent import EX_ABSTRACTS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights-dir", help="local HF/bienc checkpoint dir")
    args = ap.parse_args()

    if args.weights_dir:
        import transformers
        from aspire_tpu.models.convert import params_from_hf_model, config_from_hf
        from aspire_tpu.models.encoders import bienc_layer_weights_from_state_dict
        hf = transformers.AutoModel.from_pretrained(args.weights_dir)
        tokenizer = transformers.AutoTokenizer.from_pretrained(args.weights_dir)
        cfg = config_from_hf(hf.config)
        bert = params_from_hf_model(hf, cfg)
        try:
            lw = bienc_layer_weights_from_state_dict(hf.state_dict())
        except KeyError:
            lw = jnp.zeros((cfg.num_hidden_layers + 1,))
        params = {"bert": bert, "layer_weights": lw}
    else:
        print("no --weights-dir: random tiny encoder (demo only)")
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
        enc0 = BiEncoder(cfg)
        ids = jnp.zeros((1, 8), jnp.int32)
        params = enc0.init(jax.random.key(0), ids, jnp.ones_like(ids))["params"]

    enc = BiEncoder(cfg)
    texts = [ex["TITLE"] + " [SEP] " + " ".join(ex["ABSTRACT"]) for ex in EX_ABSTRACTS]
    rows = [tokenizer.build_inputs_with_special_tokens(
        tokenizer.convert_tokens_to_ids(tokenizer.tokenize(t)[:500])) for t in texts]
    t = max(len(r) for r in rows)
    token_ids = np.full((len(rows), t), tokenizer.pad_token_id, np.int32)
    attn = np.zeros((len(rows), t), np.int32)
    for i, r in enumerate(rows):
        token_ids[i, :len(r)] = r
        attn[i, :len(r)] = 1
    cls = jax.jit(lambda p, a, b: enc.apply({"params": p}, a, b))(
        params, jnp.asarray(token_ids), jnp.asarray(attn))
    print("CLS reps:", cls.shape)
    sim = -float(jnp.linalg.norm(cls[0] - cls[1]))
    print("bi-encoder similarity (-L2):", sim)


if __name__ == "__main__":
    main()
