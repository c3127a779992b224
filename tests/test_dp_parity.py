"""Data-parallel correctness: training on 8 devices must match 1 device.

The same superbatch stream + params must produce identical losses and final
params whether the batch is sharded over 1 or 8 devices -- the SPMD psum is
semantically invisible.  (f32, deterministic dropout off via train=True with
fixed keys.)
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aspire_tpu.core.config import RunConfig
from aspire_tpu.models.bert import BertConfig
from aspire_tpu.models.doc_models import build_model
from aspire_tpu.train.trainer import Trainer
from aspire_tpu.parallel.mesh import make_mesh, shard_batch


def make_superbatch(rng, n_micro=2, b=8, t=16, smax=4):
    def feats():
        return {
            "token_ids": rng.integers(5, 128, (n_micro, b, t)).astype(np.int32),
            "attn_mask": np.ones((n_micro, b, t), np.int32),
            "sent_ids": np.clip(rng.integers(-1, smax, (n_micro, b, t)), -1,
                                smax - 1).astype(np.int32),
            "abs_lens": rng.integers(1, smax + 1, (n_micro, b)).astype(np.int32),
        }
    return {"query": feats(), "pos": feats()}


def test_dp8_matches_dp1(tmp_path, rng):
    cfg = RunConfig.from_dict({
        "model_name": "miswordbienc", "score_aggregation": "l2max",
        "train_size": 32, "batch_size": 8, "accumulated_batch_size": 16,
        "num_epochs": 1, "learning_rate": 1e-4, "num_warmup_steps": 2,
        "lr_decay_method": "warmuplin", "es_check_every": 100,
        "max_sents": 4, "update_rule": "adam", "decay_lr_every": 1})
    model = build_model(cfg.model, BertConfig.tiny())
    batches = [make_superbatch(rng) for _ in range(3)]

    results = {}
    for n_dev in (1, 8):
        mesh = make_mesh(n_data=n_dev)
        trainer = Trainer(model, cfg, str(tmp_path / f"r{n_dev}"), mesh=mesh,
                          early_stop=False)
        state = trainer.init_state(jax.random.key(0))
        losses = []
        rng_key = jax.random.key(7)
        for sb in batches:
            rng_key, k = jax.random.split(rng_key)
            sharded = shard_batch(sb, mesh, axis=1)
            state, l = trainer._train_step(state, sharded, k)
            losses.append(np.asarray(l))
        results[n_dev] = (np.concatenate(losses),
                          jax.device_get(state.params))

    l1, p1 = results[1]
    l8, p8 = results[8]
    np.testing.assert_allclose(l1, l8, rtol=2e-4, atol=2e-4)
    # Adam normalizes tiny grads by sqrt(v), amplifying f32 reduction-order
    # noise from the cross-device psum; ~1e-4 param drift after 3 updates at
    # lr 1e-4 is numerical, not semantic.
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(a - b))), p1, p8)
    assert max(jax.tree_util.tree_leaves(diffs)) < 5e-4
