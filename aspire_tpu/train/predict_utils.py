"""Dev-set evaluation helpers (src/learning/predict_utils.py port).

batched_loss: summed no-grad loss over a dev stream (the early-stop signal,
src/learning/predict_utils.py:12-83).  batched_f1: macro/binary F1 from
logits for classification-style dev scoring (:86-141, sklearn-based in the
reference)."""
from __future__ import annotations

from typing import Iterator

import numpy as np

import jax


def batched_loss(model, params, batches: Iterator, rng=None) -> float:
    """Sum of deterministic losses over a dev batch stream."""
    key = rng if rng is not None else jax.random.key(0)
    import jax.numpy as jnp

    # cache the jitted step ON the model: a fresh inner function each call
    # would retrace (and without the persistent cache, recompile) the full
    # dev-loss program on every early-stop check; an id()-keyed module
    # cache would pin every model evaluated in the process forever
    one = getattr(model, "_jitted_dev_loss", None)
    if one is None:
        one = jax.jit(lambda p, b, k: model.train_loss(p, b, k, False))
        model._jitted_dev_loss = one

    total = 0.0
    for batch in batches:
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        total += float(one(params, batch, key))
    return total


def batched_f1(predict_fn, params, batches: Iterator, average: str = "binary") -> float:
    """F1 over a labelled dev stream; predict_fn(params, batch) -> logits.

    Each batch dict must carry 'labels'."""
    from sklearn.metrics import f1_score

    preds, golds = [], []
    for batch in batches:
        logits = np.asarray(predict_fn(params, batch))
        preds.extend(np.argmax(logits, axis=-1).tolist())
        golds.extend(np.asarray(batch["labels"]).tolist())
    return float(f1_score(golds, preds, average=average))
