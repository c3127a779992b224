"""Bisect the encoder fwd+bwd (the 210 ms question, RESULTS_r4 item 4 coda).

train_profile.py accounts the full step: encoder fwd+bwd is ~210 of ~202 ms
(scan-accum full step vs one wide batch), encoder fwd alone 34 ms, loss tail
and adam ~0.5 ms.  Backward is 5.2x forward when the matmul ratio says 2x.
This bench times each encoder component standalone, fwd and fwd+bwd, at the
same wide train shape (60 seqs x 512 toks, bf16 activations / f32 params),
so the gap gets pinned to a component instead of a guess:

  * attn_naive     -- XLA attention exactly as models/bert.py naive path
  * attn_fused_p0  -- the pallas recompute-bwd kernel at dropout_p=0
  * attn_fused_p01 -- same at the training p=0.1 (bits from hardware PRNG)
  * ffn            -- dense(3072)+gelu+dense(768)+residual LN (f32 LN)
  * layer          -- one full BertLayer (naive attention, deterministic)
  * embeddings     -- embed lookups + LN (bwd = vocab-table scatter-add)
  * pool           -- sentence_pool one-hot einsum

Run: python benchmarks/encoder_bisect.py [--seqs 60] [--seq 512] [--iters 16]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

sys.path.insert(0, str(pathlib.Path(__file__).parent))
from timing import timed_loop

from aspire_tpu.models.bert import BertConfig, BertLayer
from aspire_tpu.models.encoders import sentence_pool


def tree_sum32(tree):
    """Sum ALL leaves in f32 -- a single-leaf readout lets DCE delete the
    other leaves' grad matmuls (see train_profile.py measurement rules)."""
    return sum(x.sum().astype(jnp.float32)
               for x in jax.tree_util.tree_leaves(tree))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", type=int, default=60)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from aspire_tpu.train.trainer import enable_compilation_cache
    enable_compilation_cache()

    cfg = BertConfig()
    b, t, h, nh = args.seqs, args.seq, cfg.hidden_size, cfg.num_attention_heads
    hd = h // nh
    key = jax.random.key(0)
    rows = []

    def report(name, sec, note=""):
        rows.append({"component": name, "ms": round(sec * 1e3, 3),
                     "note": note})
        print(json.dumps(rows[-1]), flush=True)

    # ---------------- attention: naive (the models/bert.py path) ----------
    q = jax.random.normal(key, (b, t, nh, hd), jnp.bfloat16)
    k = jax.random.normal(key, (b, t, nh, hd), jnp.bfloat16)
    v = jax.random.normal(key, (b, t, nh, hd), jnp.bfloat16)
    bias = jnp.zeros((b, 1, 1, t), jnp.float32)

    def naive(q, k, v, eps):
        scores = jnp.einsum("bqhd,bkhd->bhqk", q * eps, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(hd)) + bias
        probs = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32)
        return jnp.sum(ctx.astype(jnp.float32))

    def naive_f(acc, q, k, v):
        return naive(q, k, v, (1.0 + acc * 0.0).astype(jnp.bfloat16))

    def naive_fb(acc, q, k, v):
        g = jax.grad(naive, argnums=(0, 1, 2))(
            q, k, v, (1.0 + acc * 0.0).astype(jnp.bfloat16))
        return tree_sum32(g)

    report("attn_naive_fwd", timed_loop(naive_f, args.iters, q, k, v))
    report("attn_naive_fwd_bwd", timed_loop(naive_fb, args.iters, q, k, v))

    # ---------------- attention: fused pallas kernel ----------------------
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from aspire_tpu.ops.pallas_attention import fused_dropout_attention
        qh = jnp.transpose(q, (0, 2, 1, 3))
        kh = jnp.transpose(k, (0, 2, 1, 3))
        vh = jnp.transpose(v, (0, 2, 1, 3))
        bias_row = jnp.zeros((b, t), jnp.float32)
        seed = jnp.zeros((1,), jnp.uint32)

        for p in (0.0, 0.1):
            def fused(qh, kh, vh, eps, p=p):
                ctx = fused_dropout_attention(
                    qh * eps, kh, vh, bias_row, seed, dropout_p=p,
                    sm_scale=float(1.0 / np.sqrt(hd)))
                return jnp.sum(ctx.astype(jnp.float32))

            def fused_fb(acc, qh, kh, vh, p=p):
                g = jax.grad(fused, argnums=(0, 1, 2))(
                    qh, kh, vh, (1.0 + acc * 0.0).astype(jnp.bfloat16))
                return tree_sum32(g)

            def fused_f(acc, qh, kh, vh, p=p):
                return fused(qh, kh, vh, (1.0 + acc * 0.0).astype(jnp.bfloat16))

            report(f"attn_fused_p{p}_fwd",
                   timed_loop(fused_f, args.iters, qh, kh, vh))
            report(f"attn_fused_p{p}_fwd_bwd",
                   timed_loop(fused_fb, args.iters, qh, kh, vh))

    # ---------------- FFN block (dense+gelu+dense+LN residual) ------------
    x = jax.random.normal(key, (b, t, h), jnp.bfloat16)

    class FFN(nn.Module):
        @nn.compact
        def __call__(self, x):
            inter = nn.Dense(cfg.intermediate_size, dtype=jnp.bfloat16,
                             param_dtype=jnp.float32)(x)
            inter = nn.gelu(inter, approximate=False)
            out = nn.Dense(h, dtype=jnp.bfloat16, param_dtype=jnp.float32)(inter)
            return nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                dtype=jnp.float32)(x + out).astype(jnp.bfloat16)

    ffn = FFN()
    pf = ffn.init(key, x)

    def ffn_loss(pf, x, eps):
        return jnp.sum(ffn.apply(pf, x * eps).astype(jnp.float32))

    def ffn_fb(acc, pf, x):
        g = jax.grad(ffn_loss, argnums=(0, 1))(
            pf, x, (1.0 + acc * 0.0).astype(jnp.bfloat16))
        return tree_sum32(g)

    report("ffn_fwd_bwd", timed_loop(ffn_fb, args.iters, pf, x))

    # ---------------- one full BertLayer (naive, deterministic) -----------
    layer = BertLayer(cfg, jnp.bfloat16, "auto", "auto")
    mask = jnp.ones((b, t), jnp.int32)
    pl_ = layer.init(key, x, bias, mask, True)

    def layer_loss(pl_, x, eps):
        return jnp.sum(layer.apply(pl_, x * eps, bias, mask, True
                                   ).astype(jnp.float32))

    def layer_fb(acc, pl_, x):
        g = jax.grad(layer_loss, argnums=(0, 1))(
            pl_, x, (1.0 + acc * 0.0).astype(jnp.bfloat16))
        return tree_sum32(g)

    def layer_f(acc, pl_, x):
        return layer_loss(pl_, x, (1.0 + acc * 0.0).astype(jnp.bfloat16))

    report("layer_fwd", timed_loop(layer_f, args.iters, pl_, x))
    report("layer_fwd_bwd", timed_loop(layer_fb, args.iters, pl_, x))

    # ---------------- embeddings (bwd = vocab scatter-add) ----------------
    from aspire_tpu.models.bert import BertEmbeddings
    ids = jax.random.randint(key, (b, t), 0, cfg.vocab_size)
    typ = jnp.zeros((b, t), jnp.int32)
    emb = BertEmbeddings(cfg, jnp.bfloat16)
    pe = emb.init(key, ids, typ)

    def emb_loss(pe, eps):
        # serialize through the table (int id inputs can't carry eps)
        we = dict(pe["params"]["word_embeddings"])
        we["embedding"] = we["embedding"] * eps
        pe2 = {"params": dict(pe["params"], word_embeddings=we)}
        out = emb.apply(pe2, ids, typ).astype(jnp.float32)
        return jnp.sum(out)

    def emb_fb(acc, pe):
        g = jax.grad(emb_loss)(pe, 1.0 + acc * 0.0)
        return tree_sum32(g)

    report("embeddings_fwd_bwd", timed_loop(emb_fb, args.iters, pe))

    # ---------------- sentence pool ---------------------------------------
    sent_ids = jnp.tile(jnp.arange(t, dtype=jnp.int32)[None] // (t // 20), (b, 1))
    hidden = jax.random.normal(key, (b, t, h), jnp.float32)

    def pool_loss(hidden, eps):
        return jnp.sum(sentence_pool(hidden * eps, sent_ids, 20))

    def pool_fb(acc, hidden):
        g = jax.grad(pool_loss)(hidden, 1.0 + acc * 0.0)
        return g.sum()

    report("pool_fwd_bwd", timed_loop(pool_fb, args.iters, hidden))

    naive_ms = rows[1]["ms"]
    layer_ms = rows[-3]["ms"] if on_tpu else None
    print(json.dumps({
        "attn_naive_fwd_bwd_x12_ms": round(rows[1]["ms"] * 12, 1),
        "layer_fwd_bwd_x12_ms": round(
            next(r["ms"] for r in rows if r["component"] == "layer_fwd_bwd")
            * 12, 1),
        "note": "compare against train_profile encoder_fwd_bwd",
    }, indent=1), flush=True)


if __name__ == "__main__":
    main()
