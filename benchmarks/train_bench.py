"""Train-step throughput benchmark (the flagship ts+otAspire config).

Measures optimizer-steps/s and training-triples/s for the sbalisentbienc
(ts+ot) train step at BERT-base scale -- the config the reference trains its
headline models with (sbalisentbienc-*-otstuni: micro batch 3, accumulated
batch 30, 500-token cap, reference trainer.py:139-153 + configs) -- on one
chip.  The step is the exact `train/trainer.py` program: encode query+pos,
in-batch negatives, sentsup + OT sentence triplet losses, summed-grad
accumulation (fused or scan), adam update, NaN-guarded state swap.

Timing: K full optimizer steps inside ONE jitted fori_loop with a serial
state dependency (donated state re-fed each iteration), RTT-corrected --
per-call wall timing is meaningless over the axon tunnel (see timing.py).

Run: python benchmarks/train_bench.py [--seq 512] [--micro 3] [--accum 30]
         [--mode fused|scan] [--dtype bf16|f32] [--steps 8]
"""
import argparse
import json
import pathlib
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, str(pathlib.Path(__file__).parent))
from timing import tunnel_rtt

from aspire_tpu.core.config import ModelHParams
from aspire_tpu.models.bert import BertConfig
from aspire_tpu.models.doc_models import build_model


def synth_superbatch(rng, n_micro, micro, seq, smax, vocab):
    """Random on-device training superbatch matching text/tokenize.py's
    layout: [n_micro, micro, ...] token/sent arrays + pre-aligned idx pairs."""
    ks = jax.random.split(rng, 4)
    shape = (n_micro, micro, seq)
    token_ids = jax.random.randint(ks[0], shape, 5, vocab, jnp.int32)
    attn = jnp.ones(shape, jnp.int32)
    # ~seq/smax tokens per sentence, all smax sentences present
    sent_ids = jnp.clip(
        (jnp.arange(seq, dtype=jnp.int32)[None, None, :] * smax) // seq,
        0, smax - 1) * jnp.ones((n_micro, micro, 1), jnp.int32)
    abs_lens = jnp.full((n_micro, micro), smax, jnp.int32)
    align = jax.random.randint(ks[1], (n_micro, micro, 2), 0, smax, jnp.int32)
    feats = lambda: {"token_ids": token_ids, "attn_mask": attn,
                     "sent_ids": sent_ids, "abs_lens": abs_lens}
    return {"query": feats(), "pos": {**feats(), "align": align}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--micro", type=int, default=3)
    ap.add_argument("--accum", type=int, default=30)
    ap.add_argument("--mode", choices=["fused", "scan"], default="fused")
    ap.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--max-sents", type=int, default=20)
    ap.add_argument("--tiny", action="store_true",
                    help="BertConfig.tiny() instead of BERT-base (smoke test)")
    ap.add_argument("--no-dropout", action="store_true",
                    help="diagnostic: run the step with deterministic "
                         "encodes to isolate dropout/RNG cost")
    ap.add_argument("--no-hidden-dropout", action="store_true",
                    help="diagnostic: hidden_dropout_prob=0 (embedding + "
                         "per-layer output dropout off, attention-prob "
                         "dropout KEPT) -- isolates the hidden/embedding "
                         "dropout HBM+RNG cost from the attention treatment")
    ap.add_argument("--rng", choices=["threefry", "rbg"], default="threefry",
                    help="PRNG impl for the step keys: rbg uses the TPU "
                         "hardware bit generator (dropout mask generation "
                         "is ~half the threefry step cost at t=512)")
    ap.add_argument("--attn", default="auto",
                    choices=["auto", "naive", "flash", "fused"],
                    help="attention backend; 'fused' = pallas dropout-fused "
                         "kernel on training passes (ops/pallas_attention.py)")
    ap.add_argument("--hdrop", default="auto",
                    choices=["auto", "naive", "fused"],
                    help="hidden/embedding dropout backend; 'fused' = "
                         "pallas hardware-PRNG kernel, no mask HBM traffic "
                         "(ops/pallas_dropout.py)")
    ap.add_argument("--ffn", default="auto",
                    choices=["auto", "naive", "fused"],
                    help="FFN backend; 'auto'/'fused' = pallas fused "
                         "forward, [tokens,4h] intermediate VMEM-resident "
                         "(ops/pallas_ffn.py)")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu for smoke tests; "
                         "the JAX_PLATFORMS env var alone does not switch "
                         "backends under the axon plugin)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    args.rng = {"threefry": "threefry2x32", "rbg": "rbg"}[args.rng]
    from aspire_tpu.train.trainer import enable_compilation_cache
    enable_compilation_cache()  # BERT-base step compiles take minutes
    assert args.accum % args.micro == 0
    n_micro = args.accum // args.micro

    cfg = BertConfig.tiny(max_position_embeddings=args.seq) if args.tiny \
        else BertConfig()
    if args.no_hidden_dropout:
        import dataclasses
        cfg = dataclasses.replace(cfg, hidden_dropout_prob=0.0)
    hp = ModelHParams(model_name="sbalisentbienc",
                      score_aggregation="l2wasserstein",
                      sent_sm_temp=5000.0, sent_loss_prop=1.0,
                      sentsup_loss_prop=1.0, max_seq_len=args.seq,
                      max_sents=args.max_sents, attention_impl=args.attn,
                      hidden_dropout_impl=args.hdrop, ffn_impl=args.ffn)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = build_model(hp, cfg, dtype=dtype)

    params = model.init_params(jax.random.key(0), seq_len=args.seq)
    optimizer = optax.adam(2e-5)
    opt_state = optimizer.init(params)
    sb = synth_superbatch(jax.random.key(1), n_micro, args.micro, args.seq,
                          args.max_sents, cfg.vocab_size)

    fused = args.mode == "fused"
    train_flag = not args.no_dropout

    def train_step(params, opt_state, superbatch, rng):
        if fused:
            (loss_sum, _), grads = jax.value_and_grad(
                model.train_loss_grouped, has_aux=True)(
                    params, superbatch, rng, train_flag)
        else:
            def micro_fn(carry, xs):
                grads_acc, loss_acc = carry
                batch, key = xs
                loss, grads = jax.value_and_grad(model.train_loss)(
                    params, batch, key, train_flag)
                return (jax.tree_util.tree_map(jnp.add, grads_acc, grads),
                        loss_acc + loss), loss
            zero = jax.tree_util.tree_map(jnp.zeros_like, params)
            keys = jax.random.split(rng, n_micro)
            (grads, loss_sum), _ = jax.lax.scan(
                micro_fn, (zero, 0.0), (superbatch, keys))
        ok = jnp.isfinite(loss_sum)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        keep = lambda new, old: jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), new, old)
        return keep(new_params, params), keep(new_opt, opt_state), loss_sum

    @jax.jit
    def run_steps(params, opt_state, superbatch, rng):
        def body(i, carry):
            params, opt_state, _ = carry
            step_rng = jax.random.fold_in(rng, i)
            return train_step(params, opt_state, superbatch, step_rng)
        return jax.lax.fori_loop(0, args.steps, body,
                                 (params, opt_state, jnp.float32(0.0)))

    rtt = tunnel_rtt()
    # compile + the first executions' one-off layout work (CLAUDE.md: steady
    # state by call 3 over the tunnel)
    for _ in range(2):
        out = run_steps(params, opt_state, sb,
                        jax.random.key(2, impl=args.rng))
        jax.device_get(out[2])
    t0 = time.perf_counter()
    out = run_steps(params, opt_state, sb, jax.random.key(3, impl=args.rng))
    loss = float(jax.device_get(out[2]))
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / args.steps
    triples = args.accum / dt
    # MFU: analytic encoder matmul FLOPs (query+pos encodes, fwd+bwd at 3x
    # fwd) against the v5e bf16 nominal peak -- the auditable %-of-peak
    # behind every "FLOP bound" claim (VERDICT r4 #7).  Loss tail + adam
    # excluded: MFU is conservative (true utilization is higher).
    n_seqs = 2 * args.accum
    tokens = n_seqs * args.seq
    h, L = cfg.hidden_size, cfg.num_hidden_layers
    enc_flops = 3 * (24 * h * h + 4 * args.seq * h) * tokens * L
    V5E_PEAK_BF16 = 197e12
    tflops = enc_flops / dt / 1e12
    print(json.dumps({
        "metric": "train_triples_per_sec_per_chip",
        "model": "sbalisentbienc(ts+ot)",
        "mode": args.mode + ("+nodrop" if args.no_dropout else "")
                + ("+nohidden" if args.no_hidden_dropout else "")
                + ("+hdrop-" + args.hdrop if args.hdrop != "auto" else ""),
        "rng": args.rng, "attn": args.attn, "ffn": args.ffn,
        "dtype": args.dtype, "seq_len": args.seq, "micro": args.micro,
        "accum": args.accum, "step_ms": round(dt * 1e3, 2),
        "value": round(triples, 2), "unit": "triples/s",
        "epoch_1.28M_triples_hours": round(1_276_820 / triples / 3600, 2),
        "encoder_tflops_per_s": round(tflops, 1),
        "mfu_pct_v5e_bf16_peak": round(100 * tflops * 1e12 / V5E_PEAK_BF16, 1),
        "final_loss": round(loss, 3),
    }))


if __name__ == "__main__":
    main()
