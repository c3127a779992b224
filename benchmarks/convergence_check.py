"""Flagship convergence check: BERT-base bf16 ts+otAspire, 160 optimizer steps
on synthetic clustered triples -- asserts the loss descends. Run on a TPU host:
python benchmarks/convergence_check.py (~8 min incl. compile)."""
import json, time, numpy as np, jax, jax.numpy as jnp
from aspire_tpu.core.config import RunConfig
from aspire_tpu.models.bert import BertConfig
from aspire_tpu.models.doc_models import build_model
from aspire_tpu.train.trainer import Trainer, enable_compilation_cache
from aspire_tpu.parallel.mesh import shard_batch

enable_compilation_cache()
print("start", flush=True)
rng = np.random.default_rng(0)
B, T, SMAX = 8, 256, 20
V = 30000

def topic_tokens(topic, n):
    base = 5 + (topic * 997) % 25000
    return (base + rng.integers(0, 2000, n)) % V

def feats(n_micro, topics):
    tk = np.zeros((n_micro, B, T), np.int32)
    for m in range(n_micro):
        for b in range(B):
            tk[m, b] = topic_tokens(topics[m, b], T)
    return {
        "token_ids": tk,
        "attn_mask": np.ones((n_micro, B, T), np.int32),
        "sent_ids": np.clip(rng.integers(-1, SMAX, (n_micro, B, T)), -1, SMAX - 1).astype(np.int32),
        "abs_lens": rng.integers(3, SMAX + 1, (n_micro, B)).astype(np.int32),
    }

cfg = RunConfig.from_dict({
    "model_name": "sbalisentbienc", "score_aggregation": "l2wasserstein",
    "sent_sm_temp": 5000.0, "sentsup_loss_prop": 1.0, "sent_loss_prop": 0.5,
    "train_size": 10000, "batch_size": B, "accumulated_batch_size": 2 * B,
    "num_epochs": 1, "learning_rate": 2e-5, "num_warmup_steps": 40,
    "lr_decay_method": "warmuplin", "es_check_every": 100000,
    "max_sents": SMAX, "update_rule": "adam", "decay_lr_every": 1})
model = build_model(cfg.model, BertConfig(), dtype=jnp.bfloat16)
tr = Trainer(model, cfg, "/tmp/fullscale_run", early_stop=False)
state = tr.init_state(jax.random.key(0))
key = jax.random.key(7)
losses_log = []
t0 = time.time()
for step in range(160):
    # distinct topics within each superbatch: in-batch negatives always come
    # from a different topic, so the triplet signal is clean
    topics = rng.permutation(64)[: 2 * B].reshape(2, B)
    f = feats(2, topics)
    p = feats(2, topics)  # same topics -> positives match query distribution
    p["align"] = rng.integers(0, SMAX, (2, B, 2)).astype(np.int32)
    sb = shard_batch({"query": f, "pos": p}, tr.mesh, axis=1)
    key, k = jax.random.split(key)
    state, losses = tr._train_step(state, sb, k)
    if step % 20 == 0 or step == 159:
        lv = float(np.asarray(losses).mean())
        losses_log.append(lv)
        print(f"step {step}: loss {lv:.3f} ({time.time()-t0:.0f}s)", flush=True)
print("trajectory:", [round(x,2) for x in losses_log], flush=True)
assert min(losses_log[-3:]) < losses_log[0] * 0.8, "loss did not decrease"
tr.save_checkpoint(state, "final")
print("FLAGSHIP TRAINING CONVERGES", flush=True)
