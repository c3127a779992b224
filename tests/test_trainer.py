"""End-to-end training-loop test on the 8-device virtual CPU mesh."""
import json
import numpy as np
import jax
import pytest
from transformers import BertTokenizer

from aspire_tpu.core.config import RunConfig
from aspire_tpu.models.bert import BertConfig
from aspire_tpu.models.doc_models import build_model
from aspire_tpu.train.trainer import Trainer
from aspire_tpu.train.schedules import build_schedule
from aspire_tpu.data.readers import TripleStream, dev_batches
from aspire_tpu.parallel.mesh import make_mesh

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "title"] + WORDS
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(vocab) + "\n")
    return BertTokenizer(str(p), do_lower_case=True)


def write_triples(path, n, rng, with_neg=False, with_align=False):
    def doc():
        n_sents = rng.integers(1, 4)
        abstract = [" ".join(rng.choice(WORDS, size=rng.integers(2, 6)))
                    for _ in range(n_sents)]
        d = {"TITLE": "title " + rng.choice(WORDS), "ABSTRACT": abstract}
        if with_align:
            d["cc_align"] = [int(rng.integers(0, 3)), int(rng.integers(0, 3))]
        return d
    with open(path, "w") as f:
        for _ in range(n):
            ex = {"query": doc(), "pos_context": doc()}
            if with_neg:
                ex["neg_context"] = doc()
            f.write(json.dumps(ex) + "\n")


def test_schedule_warmuplin():
    cfg = RunConfig.from_dict({
        "model_name": "miswordbienc", "train_size": 3000, "batch_size": 3,
        "num_warmup_steps": 100, "learning_rate": 1e-3,
        "lr_decay_method": "warmuplin", "num_epochs": 1})
    s = build_schedule(cfg.train)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(100)), 1e-3, rtol=1e-5)
    assert float(s(550)) < 1e-3
    np.testing.assert_allclose(float(s(1000)), 0.0, atol=1e-9)


def test_train_loop_dp(tmp_path, tok, rng):
    write_triples(tmp_path / "train.jsonl", 64, rng, with_align=True)
    write_triples(tmp_path / "dev.jsonl", 16, rng, with_neg=True, with_align=True)
    cfg = RunConfig.from_dict({
        "model_name": "sbalisentbienc", "score_aggregation": "l2lse",
        "sentsup_loss_prop": 1.0, "sent_loss_prop": 0.0,
        "train_size": 64, "dev_size": 16, "batch_size": 8,
        "accumulated_batch_size": 16, "num_epochs": 1,
        "learning_rate": 1e-4, "num_warmup_steps": 2,
        "lr_decay_method": "warmuplin", "es_check_every": 4,
        "max_sents": 4, "update_rule": "adam", "decay_lr_every": 1,
    })
    mesh = make_mesh()
    assert mesh.devices.size == 8
    model = build_model(cfg.model, BertConfig.tiny(), )
    trainer = Trainer(model, cfg, str(tmp_path / "run"), mesh=mesh)
    state = trainer.init_state(jax.random.key(0))
    p0 = jax.device_get(state.params)

    stream = TripleStream(str(tmp_path / "train.jsonl"), tok, cfg.model,
                          micro_batch=8, n_micro=2, seq_len=32,
                          align_type="cc_align")
    devfn = lambda: dev_batches(str(tmp_path / "dev.jsonl"), tok, cfg.model,
                                batch_size=8, seq_len=32, align_type="cc_align")
    state = trainer.train(state, iter(stream), devfn)
    assert int(state.step) == 4  # 64 examples / (8*2) per superbatch
    # params moved
    p1 = jax.device_get(state.params)
    diffs = jax.tree_util.tree_map(lambda a, b: float(np.abs(a - b).max()), p0, p1)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0
    # dev checks ran and checkpoints exist & reload
    assert trainer.dev_score_history
    assert (tmp_path / "run" / "run_info.json").exists()
    restored = trainer.load_checkpoint("final")
    rdiff = jax.tree_util.tree_map(lambda a, b: float(np.abs(a - b).max()), restored, p1)
    assert max(jax.tree_util.tree_leaves(rdiff)) == 0.0
    # run_info round-trips
    rc = RunConfig.from_run_info(tmp_path / "run" / "run_info.json")
    assert rc.model.model_name == "sbalisentbienc"


def test_train_step_batch_is_sharded(tmp_path, tok, rng):
    # the train step must accept data sharded over all 8 devices
    write_triples(tmp_path / "t.jsonl", 32, rng)
    cfg = RunConfig.from_dict({
        "model_name": "miswordbienc", "score_aggregation": "l2max",
        "train_size": 32, "batch_size": 16, "accumulated_batch_size": -1,
        "num_epochs": 1, "learning_rate": 1e-4, "num_warmup_steps": 2,
        "lr_decay_method": "warmuplin", "es_check_every": 100,
        "max_sents": 4, "update_rule": "adam", "decay_lr_every": 1})
    mesh = make_mesh()
    model = build_model(cfg.model, BertConfig.tiny())
    trainer = Trainer(model, cfg, str(tmp_path / "run2"), mesh=mesh, early_stop=False)
    state = trainer.init_state(jax.random.key(1))
    stream = TripleStream(str(tmp_path / "t.jsonl"), tok, cfg.model,
                          micro_batch=16, n_micro=1, seq_len=32)
    state = trainer.train(state, iter(stream))
    assert int(state.step) == 2


def test_fused_accum_step_matches_scan_on_mesh(tmp_path, tok, rng):
    """One full fused train step on the 8-device mesh produces the same
    updated params as the scan step (dropout zeroed so the only difference
    left would be grouping/permutation semantics)."""
    write_triples(tmp_path / "t.jsonl", 32, rng, with_align=True)
    cfg = RunConfig.from_dict({
        "model_name": "sbalisentbienc", "score_aggregation": "l2wasserstein",
        "sent_sm_temp": 5000.0, "sentsup_loss_prop": 1.0, "sent_loss_prop": 0.5,
        "train_size": 32, "batch_size": 8, "accumulated_batch_size": 16,
        "num_epochs": 1, "learning_rate": 1e-4, "num_warmup_steps": 2,
        "lr_decay_method": "warmuplin", "es_check_every": 100,
        "max_sents": 4, "update_rule": "adam", "decay_lr_every": 1})
    mesh = make_mesh()
    bc = BertConfig.tiny(hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    model = build_model(cfg.model, bc)
    stream = TripleStream(str(tmp_path / "t.jsonl"), tok, cfg.model,
                          micro_batch=8, n_micro=2, seq_len=32,
                          align_type="cc_align")
    sb = next(iter(stream))

    results = []
    for fused in (False, True):
        trainer = Trainer(model, cfg, str(tmp_path / f"run-{fused}"), mesh=mesh,
                          early_stop=False, fused_accum=fused)
        state = trainer.init_state(jax.random.key(1))
        from aspire_tpu.parallel.mesh import shard_batch
        batch = shard_batch(sb, mesh, axis=1)
        state, losses = trainer._train_step(state, batch, jax.random.key(5))
        results.append((jax.device_get(state.params),
                        np.sort(np.asarray(losses).ravel())))

    np.testing.assert_allclose(results[0][1], results[1][1], rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(results[0][0]),
                    jax.tree_util.tree_leaves(results[1][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_multi_epoch_global_best(tmp_path, tok, rng, monkeypatch):
    """A worse epoch-2 dev score must NOT overwrite model_cur_best: the best
    is tracked globally across epochs (reference trainer.py:222-246)."""
    write_triples(tmp_path / "t.jsonl", 16, rng, with_align=True)
    cfg = RunConfig.from_dict({
        "model_name": "sbalisentbienc", "score_aggregation": "l2lse",
        "sentsup_loss_prop": 1.0, "sent_loss_prop": 0.0,
        "train_size": 16, "dev_size": 8, "batch_size": 8,
        "accumulated_batch_size": 16, "num_epochs": 2,
        "learning_rate": 1e-4, "num_warmup_steps": 2,
        "lr_decay_method": "warmuplin", "es_check_every": 2,
        "max_sents": 4, "update_rule": "adam", "decay_lr_every": 1})
    mesh = make_mesh()
    model = build_model(cfg.model, BertConfig.tiny())
    trainer = Trainer(model, cfg, str(tmp_path / "run"), mesh=mesh)

    # dev worsens in epoch 2
    scores = iter([10.0, 5.0])
    monkeypatch.setattr(Trainer, "dev_score",
                        lambda self, st, db: next(scores))
    saves = []
    orig_save = Trainer.save_checkpoint

    def spy(self, state, suffix):
        saves.append((suffix, int(state.step)))
        if suffix == "cur_best":
            spy.best_params = jax.device_get(state.params)
        orig_save(self, state, suffix)

    monkeypatch.setattr(Trainer, "save_checkpoint", spy)
    state = trainer.init_state(jax.random.key(0))
    stream = TripleStream(str(tmp_path / "t.jsonl"), tok, cfg.model,
                          micro_batch=8, n_micro=2, seq_len=32,
                          align_type="cc_align")
    state = trainer.train(state, stream, lambda: iter(()), epochs=2)

    assert int(state.step) == 2          # one optimizer step per epoch
    assert trainer.best_score == 10.0
    # cur_best written exactly once, at the epoch-1 check (step 1)
    assert [s for s in saves if s[0] == "cur_best"] == [("cur_best", 1)]
    # and the checkpoint on disk still holds the epoch-1 params, which must
    # differ from the final (epoch-2) params
    cb = trainer.load_checkpoint("cur_best")
    for a, b in zip(jax.tree_util.tree_leaves(cb),
                    jax.tree_util.tree_leaves(spy.best_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    final = jax.device_get(state.params)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        cb, final)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


def test_multi_epoch_rejects_plain_iterator(tmp_path, tok, rng):
    """epochs > 1 with an already-consumable iterator would silently train
    epoch 1 only (iter(it) is it); the trainer must refuse loudly."""
    write_triples(tmp_path / "t.jsonl", 16, rng)
    cfg = RunConfig.from_dict({
        "model_name": "miswordbienc", "score_aggregation": "l2max",
        "train_size": 16, "batch_size": 8, "accumulated_batch_size": 16,
        "num_epochs": 2, "learning_rate": 1e-4, "num_warmup_steps": 2,
        "lr_decay_method": "warmuplin", "es_check_every": 100,
        "max_sents": 4, "update_rule": "adam", "decay_lr_every": 1})
    mesh = make_mesh()
    model = build_model(cfg.model, BertConfig.tiny())
    trainer = Trainer(model, cfg, str(tmp_path / "run"), mesh=mesh,
                      early_stop=False)
    state = trainer.init_state(jax.random.key(0))
    stream = TripleStream(str(tmp_path / "t.jsonl"), tok, cfg.model,
                          micro_batch=8, n_micro=2, seq_len=32)
    with pytest.raises(ValueError, match="re-iterable"):
        trainer.train(state, iter(stream), epochs=2)


def test_fast_rng_trains(tmp_path, tok, rng):
    """rng_impl='rbg' (CLI --fast-rng): the whole step -- dropout streams +
    in-batch-negative permutations -- runs on the hardware-bit-generator key
    type and still trains (typed keys carry the impl through split/fold_in;
    on TPU threefry mask generation is ~half the t=512 step cost)."""
    write_triples(tmp_path / "t.jsonl", 32, rng)
    cfg = RunConfig.from_dict({
        "model_name": "miswordbienc", "score_aggregation": "l2max",
        "train_size": 32, "batch_size": 8, "accumulated_batch_size": 16,
        "num_epochs": 1, "learning_rate": 1e-4, "num_warmup_steps": 2,
        "lr_decay_method": "warmuplin", "es_check_every": 100,
        "max_sents": 4, "update_rule": "adam", "decay_lr_every": 1})
    mesh = make_mesh()
    model = build_model(cfg.model, BertConfig.tiny())
    trainer = Trainer(model, cfg, str(tmp_path / "run"), mesh=mesh,
                      early_stop=False, rng_impl="rbg")
    state = trainer.init_state(jax.random.key(0))
    p0 = jax.device_get(state.params)
    stream = TripleStream(str(tmp_path / "t.jsonl"), tok, cfg.model,
                          micro_batch=8, n_micro=2, seq_len=32)
    # 2 optimizer updates: the first warmuplin update is at lr 0
    state = trainer.train(state, iter(stream))
    assert int(state.step) == 2
    assert np.isfinite(trainer.loss_history).all()
    p1 = jax.device_get(state.params)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), p0, p1)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0
