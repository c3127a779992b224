"""Cross-check train_profile's encoder rows against two measurement hazards.

train_profile.py's component rows (not the full step) had two flaws:
  * the fori_loop dependency rode the OUTPUT (loss * eps) -- the component's
    work is loop-invariant, so XLA may hoist part of it;
  * backward rows returned `tree_leaves(g)[0].sum()` -- every other leaf's
    dW matmul is dead code and DCE removes it (the giveaway: the adam row
    measured 0.14 ms against a ~3.8 ms HBM floor for a 110M-param update).

This check serializes through an INPUT (the word-embedding table scaled by
(1 + acc*0)) and sums ALL gradient leaves, so nothing is hoistable or dead.

Run: python benchmarks/enc_check.py [--iters 4]
"""
import argparse
import json
import pathlib
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).parent))
from timing import timed_loop
from train_bench import synth_superbatch

from aspire_tpu.core.config import ModelHParams
from aspire_tpu.models.bert import BertConfig
from aspire_tpu.models.doc_models import build_model


def tree_sum32(tree) -> jax.Array:
    return sum(x.sum().astype(jnp.float32)
               for x in jax.tree_util.tree_leaves(tree))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--micro", type=int, default=3)
    ap.add_argument("--accum", type=int, default=30)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--max-sents", type=int, default=20)
    args = ap.parse_args()
    from aspire_tpu.train.trainer import enable_compilation_cache
    enable_compilation_cache()
    n_micro = args.accum // args.micro

    cfg = BertConfig()
    hp = ModelHParams(model_name="sbalisentbienc",
                      score_aggregation="l2wasserstein",
                      sent_sm_temp=5000.0, sent_loss_prop=1.0,
                      sentsup_loss_prop=1.0, max_seq_len=args.seq,
                      max_sents=args.max_sents)
    model = build_model(hp, cfg, dtype=jnp.bfloat16)
    params = model.init_params(jax.random.key(0), seq_len=args.seq)
    sb = synth_superbatch(jax.random.key(1), n_micro, args.micro, args.seq,
                          args.max_sents, cfg.vocab_size)
    wide = jax.tree_util.tree_map(
        lambda x: x.reshape((n_micro * args.micro,) + x.shape[2:]), sb)
    q, p = wide["query"], wide["pos"]

    def scale_params(params, eps):
        # perturb the word-embedding table so every iteration's forward
        # depends on the loop carry; costs one [vocab, h] f32 read+write
        emb = dict(params["bert"]["embeddings"])
        we = dict(emb["word_embeddings"])
        we["embedding"] = we["embedding"] * eps
        emb["word_embeddings"] = we
        bert = dict(params["bert"], embeddings=emb)
        return dict(params, bert=bert)

    def enc_loss(params, q, p):
        qc, qs = model.encode(params, q)
        pc, ps = model.encode(params, p)
        return (jnp.sum(qc) + jnp.sum(qs.embed) + jnp.sum(pc)
                + jnp.sum(ps.embed)).astype(jnp.float32)

    def enc_f(acc, params, q, p):
        return enc_loss(scale_params(params, 1.0 + acc * 0.0), q, p)

    def enc_fb(acc, params, q, p):
        g = jax.grad(enc_loss)(scale_params(params, 1.0 + acc * 0.0), q, p)
        return tree_sum32(g)

    for name, fn in (("encoder_fwd_serialized", enc_f),
                     ("encoder_fwd_bwd_serialized", enc_fb)):
        sec = timed_loop(fn, args.iters, params, q, p)
        print(json.dumps({"component": name, "ms": round(sec * 1e3, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
