"""Small auxiliary modules: profiling timers/traces + dev-scoring helpers
(reference has neither tracing nor a dev F1 path outside sklearn calls;
predict_utils mirrors src/learning/predict_utils.py:12-141)."""
import logging

import numpy as np
import jax
import jax.numpy as jnp

from aspire_tpu.utils.profiling import PhaseTimer, trace
from aspire_tpu.train.predict_utils import batched_loss, batched_f1


def test_phase_timer_accumulates():
    t = PhaseTimer()
    for _ in range(3):
        with t("encode"):
            pass
    with t("score"):
        pass
    s = t.summary()
    assert s["encode"]["count"] == 3 and s["score"]["count"] == 1
    assert s["encode"]["total_s"] >= 0.0
    assert abs(s["encode"]["mean_s"] - s["encode"]["total_s"] / 3) < 1e-6
    t.log_summary()   # must not raise


def test_trace_annotation_wraps_jit():
    # the annotation path (no log_dir) must be usable around jitted calls
    with trace(name="unit"):
        x = jax.jit(lambda a: a * 2)(jnp.ones((4,)))
    np.testing.assert_array_equal(np.asarray(x), 2 * np.ones((4,)))


def test_trace_device_capture(tmp_path):
    with trace(log_dir=str(tmp_path)):
        jax.jit(lambda a: a + 1)(jnp.zeros((2,)))
    # a profile dir with at least one artifact appears
    assert any(tmp_path.rglob("*"))


class _ToyModel:
    @staticmethod
    def train_loss(params, batch, key, train):
        return jnp.sum((batch["x"] - params["w"]) ** 2)


def test_batched_loss_sums_dev_stream():
    params = {"w": jnp.zeros((3,))}
    batches = [{"x": np.full((3,), 2.0, np.float32)},
               {"x": np.full((3,), 1.0, np.float32)}]
    total = batched_loss(_ToyModel, params, iter(batches))
    assert abs(total - (12.0 + 3.0)) < 1e-5


def test_batched_f1_binary():
    def predict(params, batch):
        return batch["logits"]
    batches = [
        {"logits": np.array([[0.1, 0.9], [0.8, 0.2]]), "labels": [1, 0]},
        {"logits": np.array([[0.2, 0.8], [0.9, 0.1]]), "labels": [0, 0]},
    ]
    # preds = [1, 0, 1, 0]; golds = [1, 0, 0, 0] -> tp=1 fp=1 fn=0
    f1 = batched_f1(predict, None, iter(batches))
    assert abs(f1 - (2 * 1 / (2 * 1 + 1 + 0))) < 1e-6
