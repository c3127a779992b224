"""Learning-rate schedules matching the reference trainer semantics.

The reference steps its scheduler once every `decay_lr_every` *micro*
iterations (trainer.py:289-291) while the optimizer steps every
`accumulated_batch_size/batch_size` micro iterations, and sizes warmup/total
in micro-iteration units (trainer.py:196-207).  `build_schedule` therefore
produces a function of the *micro-iteration count*; the trainer converts its
update count to micro iterations before lookup.
"""
from __future__ import annotations

import optax

from ..core.config import TrainHParams


def total_micro_iters(tp: TrainHParams) -> int:
    num_batches = max(1, -(-tp.train_size // tp.batch_size))
    return tp.num_epochs * num_batches


def build_schedule(tp: TrainHParams):
    """-> callable(micro_iter) -> lr, mirroring trainer.py:188-207."""
    total = total_micro_iters(tp)
    if tp.lr_decay_method == "warmuplin":
        # transformers get_linear_schedule_with_warmup: linear 0 -> peak over
        # warmup steps, then linear peak -> 0 at `total`.
        warmup = max(1, tp.num_warmup_steps)
        decay = max(total, warmup + 1)
        return optax.schedules.join_schedules([
            optax.schedules.linear_schedule(0.0, tp.learning_rate, warmup),
            optax.schedules.linear_schedule(tp.learning_rate, 0.0, decay - warmup),
        ], boundaries=[warmup])
    if tp.lr_decay_method == "warmupcosine":
        return optax.schedules.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=tp.learning_rate,
            warmup_steps=max(1, tp.num_warmup_steps),
            decay_steps=max(total, tp.num_warmup_steps + 1), end_value=0.0)
    if tp.lr_decay_method == "exponential":
        # reference: ExponentialLR stepped every decay_lr_every micro iters
        return optax.schedules.exponential_decay(
            init_value=tp.learning_rate, transition_steps=max(1, tp.decay_lr_every),
            decay_rate=tp.decay_lr_by, staircase=True)
    raise ValueError(f"Unknown lr_decay_method: {tp.lr_decay_method}")
