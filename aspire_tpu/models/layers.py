"""Generic layers (src/learning/models_common/generic_layers.py ports).

SoftmaxMixLayers lives in encoders.py (BiEncoder's scalar mix).  The rest of
the reference's shared layers are provided here for model-building parity:
FeedForwardNet (:18-68), GatedAttention (:83-114), StraightThroughEstimator
(:120-136).

Dormancy note: no model in the reference consumes FeedForwardNet,
GatedAttention, or StraightThroughEstimator either -- they are defined in
generic_layers.py but unreferenced anywhere else in src/ (verified by grep).
They are intentionally parity-only here too: tested building blocks
(tests/test_layers.py) kept for users porting custom reference models, not
dead code awaiting wiring.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.types import masked_softmax

NONLINEARITIES = {
    "tanh": nn.tanh,
    "relu": nn.relu,
    "sigmoid": nn.sigmoid,
    "softplus": nn.softplus,
}


class FeedForwardNet(nn.Module):
    """MLP with configurable hidden dims/non-linearity; `score_ffn` drops the
    final non-linearity (attention-score head)."""

    out_dim: int
    non_linearity: str = "relu"
    composition_dims: Sequence[int] = ()
    dropout_p: float = 0.3
    use_bias: bool = True
    score_ffn: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = NONLINEARITIES[self.non_linearity]
        dims = list(self.composition_dims) + [self.out_dim]
        if self.composition_dims:
            for i, d in enumerate(dims):
                x = nn.Dense(d, use_bias=self.use_bias, name=f"lin_{i}")(x)
                last = i == len(dims) - 1
                if not (last and self.score_ffn):
                    x = act(x)
                if not last:
                    x = nn.Dropout(self.dropout_p)(x, deterministic=deterministic)
        else:
            x = act(nn.Dense(self.out_dim, use_bias=self.use_bias, name="lin_0")(x))
        return x


class GatedAttention(nn.Module):
    """Gated attention MIL pooling (Ilse et al. 2018): softmaxed per-position
    weights from tanh(Vx) * sigmoid(Ux)."""

    embed_dim: int

    @nn.compact
    def __call__(self, in_seq, seq_lens):
        # in_seq: [b, t, d]; seq_lens: i32[b] -> weights [b, t]
        hidden = nn.tanh(nn.Dense(self.embed_dim, use_bias=False, name="lin_V")(in_seq))
        gates = nn.sigmoid(nn.Dense(self.embed_dim, use_bias=False, name="lin_U")(in_seq))
        scores = nn.Dense(1, use_bias=False, name="score_weight")(hidden * gates)[..., 0]
        return masked_softmax(scores, seq_lens)


@jax.custom_vjp
def straight_through(x: jax.Array) -> jax.Array:
    """Binary step with the reference's straight-through gradient
    (generic_layers.py:120-136): STEFunction.backward returns
    hardtanh(grad_output) -- the INCOMING gradient clamped to [-1, 1],
    independent of x (it is not the hardtanh derivative at x)."""
    return (x >= 0).astype(x.dtype)


def _ste_fwd(x):
    return straight_through(x), None


def _ste_bwd(_, g):
    return (jnp.clip(g, -1.0, 1.0),)


straight_through.defvjp(_ste_fwd, _ste_bwd)
