"""Full-state checkpoint/resume and NaN-guard tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aspire_tpu.core.config import RunConfig
from aspire_tpu.models.bert import BertConfig
from aspire_tpu.models.doc_models import build_model
from aspire_tpu.train.trainer import Trainer
from aspire_tpu.parallel.mesh import make_mesh, shard_batch


def make_superbatch(rng, n_micro=1, b=8, t=16, smax=4, poison=False):
    def feats():
        f = {
            "token_ids": rng.integers(5, 128, (n_micro, b, t)).astype(np.int32),
            "attn_mask": np.ones((n_micro, b, t), np.int32),
            "sent_ids": np.clip(rng.integers(-1, smax, (n_micro, b, t)), -1,
                                smax - 1).astype(np.int32),
            "abs_lens": rng.integers(1, smax + 1, (n_micro, b)).astype(np.int32),
        }
        return f
    sb = {"query": feats(), "pos": feats()}
    return sb


CFG = {
    "model_name": "miswordbienc", "score_aggregation": "l2max",
    "train_size": 32, "batch_size": 8, "accumulated_batch_size": -1,
    "num_epochs": 1, "learning_rate": 1e-4, "num_warmup_steps": 2,
    "lr_decay_method": "warmuplin", "es_check_every": 100,
    "max_sents": 4, "update_rule": "adam", "decay_lr_every": 1}


def test_full_state_resume(tmp_path, rng):
    cfg = RunConfig.from_dict(CFG)
    model = build_model(cfg.model, BertConfig.tiny())
    mesh = make_mesh(n_data=1)
    tr = Trainer(model, cfg, str(tmp_path / "r"), mesh=mesh, early_stop=False)
    state = tr.init_state(jax.random.key(0))
    sb = shard_batch(make_superbatch(rng), mesh, axis=1)
    state, _ = tr._train_step(state, sb, jax.random.key(1))
    tr.save_full_state(state, "resume")
    snapshot = jax.device_get(state.params)

    # continue one more step from the live state
    state_cont, _ = tr._train_step(state, sb, jax.random.key(2))
    want = jax.device_get(state_cont.params)

    # resume from disk and take the same step -> identical result
    tr2 = Trainer(model, cfg, str(tmp_path / "r"), mesh=mesh, early_stop=False)
    restored = tr2.restore_full_state("resume")
    assert int(restored.step) == 1
    rparams = jax.device_get(restored.params)
    d0 = jax.tree_util.tree_map(lambda a, b: float(np.abs(a - b).max()),
                                snapshot, rparams)
    assert max(jax.tree_util.tree_leaves(d0)) == 0.0
    state2, _ = tr2._train_step(restored, sb, jax.random.key(2))
    got = jax.device_get(state2.params)
    diffs = jax.tree_util.tree_map(lambda a, b: float(np.abs(a - b).max()),
                                   want, got)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-7


def test_restore_preserves_perturbed_adam_moments(tmp_path, rng):
    """Restore must reassemble opt state by KEY (abstract target), never by
    leaf order: perturb each adam moment with a distinct marker and require
    bitwise equality after the round trip."""
    cfg = RunConfig.from_dict(CFG)
    model = build_model(cfg.model, BertConfig.tiny())
    mesh = make_mesh(n_data=1)
    tr = Trainer(model, cfg, str(tmp_path / "r"), mesh=mesh, early_stop=False)
    state = tr.init_state(jax.random.key(0))
    sb = shard_batch(make_superbatch(rng), mesh, axis=1)
    state, _ = tr._train_step(state, sb, jax.random.key(1))

    # stamp every opt-state leaf with a unique fingerprint
    counter = [0]

    def stamp(x):
        counter[0] += 1
        if np.issubdtype(np.asarray(x).dtype, np.floating):
            return jnp.asarray(np.asarray(x) + counter[0] * 1e-3)
        return x

    from aspire_tpu.train.trainer import TrainState
    stamped = TrainState(
        step=state.step, params=state.params,
        opt_state=jax.tree_util.tree_map(stamp, state.opt_state))
    tr.save_full_state(stamped, "stamped")

    tr2 = Trainer(model, cfg, str(tmp_path / "r"), mesh=mesh, early_stop=False)
    restored = tr2.restore_full_state("stamped")
    # same structure AND bitwise-identical leaves in matching positions
    assert (jax.tree_util.tree_structure(restored.opt_state)
            == jax.tree_util.tree_structure(stamped.opt_state))
    want = jax.device_get(stamped.opt_state)
    got = jax.device_get(restored.opt_state)
    for a, b in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nan_guard_suppresses_update(tmp_path, rng):
    cfg = RunConfig.from_dict(CFG)
    model = build_model(cfg.model, BertConfig.tiny())
    mesh = make_mesh(n_data=1)
    tr = Trainer(model, cfg, str(tmp_path / "r"), mesh=mesh, early_stop=False)
    state = tr.init_state(jax.random.key(0))
    p_before = jax.device_get(state.params)
    sb = make_superbatch(rng)
    # poison the embeddings via inf token reps: easiest is to poison params?
    # Instead: poison the batch with an extreme value that produces inf loss
    # through the encoder is hard; poison params directly.
    bad_params = jax.tree_util.tree_map(lambda x: x, state.params)
    import flax
    bad = jax.device_get(state.params)
    bad["bert"]["embeddings"]["word_embeddings"]["embedding"] = (
        np.asarray(bad["bert"]["embeddings"]["word_embeddings"]["embedding"])
        * np.inf)
    from aspire_tpu.train.trainer import TrainState
    state_bad = TrainState(step=state.step,
                           params=jax.tree_util.tree_map(jnp.asarray, bad),
                           opt_state=tr.optimizer.init(
                               jax.tree_util.tree_map(jnp.asarray, bad)))
    sbs = shard_batch(sb, mesh, axis=1)
    new_state, losses = tr._train_step(state_bad, sbs, jax.random.key(1))
    assert not np.isfinite(np.asarray(losses)).all()
    # params unchanged where they were finite (update suppressed -> adam with
    # zero grads only applies zero updates)
    new_p = jax.device_get(new_state.params)
    ln = np.asarray(new_p["bert"]["layer_0"]["attention_self"]["query"]["kernel"])
    old = np.asarray(bad["bert"]["layer_0"]["attention_self"]["query"]["kernel"])
    np.testing.assert_array_equal(ln, old)


def test_nan_guard_suppresses_update_with_momentum(tmp_path, rng):
    """The poisoned step must leave params AND optimizer state untouched
    even when adam already carries momentum: zeroed grads alone would take
    a momentum-only step and advance count/moments."""
    cfg = RunConfig.from_dict(CFG)
    model = build_model(cfg.model, BertConfig.tiny())
    mesh = make_mesh(n_data=1)
    tr = Trainer(model, cfg, str(tmp_path / "r"), mesh=mesh, early_stop=False)
    state = tr.init_state(jax.random.key(0))
    sbs = shard_batch(make_superbatch(rng), mesh, axis=1)
    # one FINITE step builds nonzero momentum
    state, losses = tr._train_step(state, sbs, jax.random.key(1))
    assert np.isfinite(np.asarray(losses)).all()
    p1 = jax.device_get(state.params)
    o1 = jax.device_get(state.opt_state)
    # poison the batch so the loss goes non-finite without touching params
    bad_sb = jax.tree_util.tree_map(lambda x: x, make_superbatch(rng))
    import dataclasses
    poisoned = shard_batch(bad_sb, mesh, axis=1)
    # inf loss via an inf alignment-free route: scale a params copy is the
    # established trick -- here poison the step by making every query rep
    # inf through inf embeddings in a params copy
    bad = jax.device_get(state.params)
    bad["bert"]["embeddings"]["word_embeddings"]["embedding"] = (
        np.asarray(bad["bert"]["embeddings"]["word_embeddings"]["embedding"])
        * np.inf)
    from aspire_tpu.train.trainer import TrainState
    state_bad = TrainState(step=state.step,
                           params=jax.tree_util.tree_map(jnp.asarray, bad),
                           opt_state=state.opt_state)
    new_state, losses = tr._train_step(state_bad, poisoned, jax.random.key(2))
    assert not np.isfinite(np.asarray(losses)).all()
    newp = jax.device_get(new_state.params)
    newo = jax.device_get(new_state.opt_state)
    # every param leaf identical to its pre-step value, incl. the poisoned
    # embedding table (no momentum step), and optimizer state frozen
    for a, b in zip(jax.tree_util.tree_leaves(newp),
                    jax.tree_util.tree_leaves(bad)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(newo),
                    jax.tree_util.tree_leaves(o1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
