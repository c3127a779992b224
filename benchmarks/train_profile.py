"""Component accounting for the flagship train step (the 196 ms question).

RESULTS_r4 closed the dropout tax with measured bounds: 211 ms full step =
196 ms no-dropout + 7.1 ms hidden dropout (HBM floor) + 7.4 ms attention
dropout (recompute floor).  This profile accounts for the 196 ms itself:
where do the no-dropout milliseconds go, and how far is each part from its
hardware ceiling?  Components, each timed as K iterations inside one jitted
fori_loop with a serial dependency (benchmarks/timing.py):

  * full        -- the exact fused-accum no-dropout optimizer step
  * enc_fwd_bwd -- BERT fwd+bwd (+sentence pooling) for query+pos wide
                   batch, grad wrt params of a scalar readout: the encoder
                   share of the step
  * enc_fwd     -- encoder forward alone (bwd = enc_fwd_bwd - enc_fwd)
  * loss_tail   -- grouped loss (in-batch negs, l2sup + OT Sinkhorn,
                   triplets) fwd+bwd wrt the ENCODED reps: the scoring tail
  * adam        -- optimizer.update + apply_updates on the 110M-param tree
  * mxu_rate    -- empirical MXU ceiling at this program's exact matmul
                   shapes ([tokens, 768]x[768, 768] and the FFN pair),
                   converting the encoder's analytic FLOPs into an
                   achievable-floor ms for THIS chip

Measurement rules (learned the hard way, see enc_check.py): the fori_loop
dependency must ride an INPUT of the component (an output-side `* eps`
leaves the work loop-invariant and XLA hoists some of it), and backward
rows must sum ALL gradient leaves (returning one leaf lets DCE delete every
other leaf's dW matmul -- the original adam row measured 0.14 ms against a
~3.8 ms HBM floor).

Run: python benchmarks/train_profile.py [--seq 512] [--micro 3] [--accum 30]
         [--iters 4]
"""
import argparse
import json
import pathlib
import sys

import numpy as np

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, str(pathlib.Path(__file__).parent))
from timing import timed_loop
from train_bench import synth_superbatch

from aspire_tpu.core.config import ModelHParams
from aspire_tpu.core.types import MultiVec
from aspire_tpu.models.bert import BertConfig
from aspire_tpu.models.doc_models import build_model


def tree_sum32(tree):
    """Sum of all leaves in f32: keeps every gradient leaf LIVE (a single-
    leaf readout lets XLA DCE the other leaves' dW matmuls)."""
    import jax.tree_util as jtu
    return sum(x.sum().astype(jnp.float32) for x in jtu.tree_leaves(tree))


def scale_word_embeddings(params, eps):
    """Scale the word-embedding table by eps: threads the timing loop's
    carry through an INPUT so no component work is loop-invariant."""
    emb = dict(params["bert"]["embeddings"])
    we = dict(emb["word_embeddings"])
    we["embedding"] = we["embedding"] * eps
    emb["word_embeddings"] = we
    return dict(params, bert=dict(params["bert"], embeddings=emb))


def encoder_flops(n_seqs: int, seq: int, cfg: BertConfig) -> dict:
    """Analytic matmul FLOPs of the encoder fwd and fwd+bwd (per step).

    Per token per layer fwd: QKV+O projections 2*4h^2, FFN 2*2*4h^2 = 24h^2;
    attention score+mix 2*2*t*h.  Backward re-does ~2x the fwd matmul work.
    """
    tokens = n_seqs * seq
    h = cfg.hidden_size
    lin = 24 * h * h * tokens * cfg.num_hidden_layers
    attn = 4 * seq * h * tokens * cfg.num_hidden_layers
    return {"fwd": lin + attn, "fwd_bwd": 3 * (lin + attn)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--micro", type=int, default=3)
    ap.add_argument("--accum", type=int, default=30)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--max-sents", type=int, default=20)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from aspire_tpu.train.trainer import enable_compilation_cache
    enable_compilation_cache()
    n_micro = args.accum // args.micro

    cfg = BertConfig.tiny(max_position_embeddings=args.seq) if args.tiny \
        else BertConfig()
    hp = ModelHParams(model_name="sbalisentbienc",
                      score_aggregation="l2wasserstein",
                      sent_sm_temp=5000.0, sent_loss_prop=1.0,
                      sentsup_loss_prop=1.0, max_seq_len=args.seq,
                      max_sents=args.max_sents, attention_impl="auto",
                      hidden_dropout_impl="auto")
    model = build_model(hp, cfg, dtype=jnp.bfloat16)
    params = model.init_params(jax.random.key(0), seq_len=args.seq)
    optimizer = optax.adam(2e-5)
    opt_state = optimizer.init(params)
    sb = synth_superbatch(jax.random.key(1), n_micro, args.micro, args.seq,
                          args.max_sents, cfg.vocab_size)
    wide = jax.tree_util.tree_map(
        lambda x: x.reshape((n_micro * args.micro,) + x.shape[2:]), sb)
    n_seqs = 2 * n_micro * args.micro          # query + pos
    rows = []

    def report(name, sec, note=""):
        rows.append({"component": name, "ms": round(sec * 1e3, 2),
                     "note": note})
        print(json.dumps(rows[-1]), flush=True)

    # ---- full no-dropout optimizer step (the 196 ms row) ----
    def full(acc, params, opt_state, sb):
        params = scale_word_embeddings(params, 1.0 + acc * 0.0)
        (loss, _), grads = jax.value_and_grad(
            model.train_loss_grouped, has_aux=True)(
                params, sb, jax.random.key(7), False)
        updates, _ = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return loss + acc * 0.0 + tree_sum32(new_params) * 0.0

    # NOTE: params/opt_state/batches must ride timed_loop's *args (real jit
    # arguments) — a closure would bake 110M+ floats into the HLO as
    # constants and blow the tunnel's remote-compile upload limit (HTTP 413).
    sec_full = timed_loop(full, args.iters, params, opt_state, sb)
    report("full_step_nodrop", sec_full, "fused accum, deterministic")

    # ---- encoder fwd+bwd (query+pos wide batch) ----
    q, p = wide["query"], wide["pos"]

    def enc_loss(params, q, p):
        qc, qs = model.encode(params, q)
        pc, ps = model.encode(params, p)
        return (jnp.sum(qc) + jnp.sum(qs.embed) + jnp.sum(pc)
                + jnp.sum(ps.embed)).astype(jnp.float32)

    def enc_fb(acc, params, q, p):
        g = jax.grad(enc_loss)(scale_word_embeddings(params, 1.0 + acc * 0.0),
                               q, p)
        return tree_sum32(g)

    sec_fb = timed_loop(enc_fb, args.iters, params, q, p)
    report("encoder_fwd_bwd", sec_fb, f"{n_seqs} seqs x {args.seq} toks")

    def enc_f(acc, params, q, p):
        return enc_loss(scale_word_embeddings(params, 1.0 + acc * 0.0), q, p)

    sec_f = timed_loop(enc_f, args.iters, params, q, p)
    report("encoder_fwd", sec_f)

    # ---- loss tail: grouped losses fwd+bwd wrt the encoded reps ----
    qc, qs = jax.jit(model.encode)(params, q)
    pc, ps = jax.jit(model.encode)(params, p)
    regroup = lambda x: np.asarray(
        x.reshape((n_micro, args.micro) + x.shape[1:]), np.float32)
    qc_g, qe_g = regroup(qc), regroup(qs.embed)
    pc_g, pe_g = regroup(pc), regroup(ps.embed)
    ql_g = np.asarray(qs.lens.reshape(n_micro, args.micro))
    pl_g = np.asarray(ps.lens.reshape(n_micro, args.micro))

    def tail_loss(reps, eps):
        qc, qe, pc, pe = reps

        def group(batch_g, qc, qe, ql, pc, pe, pl):
            perm = jax.random.permutation(jax.random.key(11), args.micro)
            q_s = MultiVec(embed=qe * eps, lens=ql)
            p_s = MultiVec(embed=pe, lens=pl)
            n_s = MultiVec(embed=pe[perm], lens=pl[perm])
            return model._combine_losses(batch_g, qc, q_s, pc, p_s,
                                         pc[perm], n_s, perm)
        losses = jax.vmap(group)(sb, qc, qe, jnp.asarray(ql_g),
                                 pc, pe, jnp.asarray(pl_g))
        return jnp.sum(losses).astype(jnp.float32)

    def tail(acc, reps):
        g = jax.grad(tail_loss)(reps, 1.0 + acc * 0.0)
        return tree_sum32(g)

    reps = tuple(map(jnp.asarray, (qc_g, qe_g, pc_g, pe_g)))
    sec_tail = timed_loop(tail, args.iters * 8, reps)
    report("loss_tail_fwd_bwd", sec_tail,
           "in-batch negs + l2sup + OT Sinkhorn + triplets, grad wrt reps")

    # ---- adam ----
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    def adam(acc, grads, opt_state, params):
        g = jax.tree_util.tree_map(lambda x: x * (1.0 + acc * 0.0), grads)
        updates, new_state = optimizer.update(g, opt_state, params)
        out = optax.apply_updates(params, updates)
        # keep params AND the new m/v moments live (the real step writes both)
        return tree_sum32(out) + tree_sum32(
            jax.tree_util.tree_leaves(new_state))

    sec_adam = timed_loop(adam, args.iters * 8, grads, opt_state, params)
    report("adam_update", sec_adam, "110M-param tree" if not args.tiny else "")

    # ---- empirical MXU rate at this program's matmul shapes ----
    tokens = n_seqs * args.seq
    h = cfg.hidden_size
    x = jnp.ones((tokens, h), jnp.bfloat16)
    w1 = jnp.ones((h, h), jnp.bfloat16)
    w2 = jnp.ones((h, 4 * h), jnp.bfloat16)
    w3 = jnp.ones((4 * h, h), jnp.bfloat16)

    def mm(acc, x, w1, w2, w3):
        y = (x + acc * 0.0) @ w1
        z = jax.nn.gelu(y @ w2)
        # full-sum readout: a single-element readout invites slice pushdown
        return jnp.sum(z @ w3).astype(jnp.float32)

    sec_mm = timed_loop(mm, args.iters * 16, x, w1, w2, w3)
    mm_flops = 2 * tokens * (h * h + 2 * 4 * h * h)
    rate = mm_flops / sec_mm
    fl = encoder_flops(n_seqs, args.seq, cfg)
    floor_fb = fl["fwd_bwd"] / rate
    print(json.dumps({
        "mxu_rate_tflops": round(rate / 1e12, 1),
        "encoder_flops_fwd_bwd_T": round(fl["fwd_bwd"] / 1e12, 2),
        "encoder_floor_ms_at_measured_rate": round(floor_fb * 1e3, 1),
        "encoder_measured_ms": rows[1]["ms"],
        "encoder_pct_of_floor": round(100 * floor_fb / sec_fb, 1),
        "accounted_ms": round((sec_fb + sec_tail + sec_adam) * 1e3, 2),
        "full_step_ms": rows[0]["ms"],
    }, indent=1), flush=True)


if __name__ == "__main__":
    main()
