"""Pallas TPU kernel: fused sentence gather-mean pooling.

The production path (models/encoders.sentence_pool) is a one-hot segment-mean
einsum that XLA already fuses onto the MXU; this kernel is the explicit
fused version named in BASELINE.json's north star -- the one-hot matrix is
built in VMEM from the sent_ids row (never materialized in HBM) and both the
sum and the counts come from a single [S, T] x [T, H] MXU pass per example.

Parity-tested against sentence_pool in tests/test_pallas.py; on-chip it is
exactly equal (0.0 diff) and ~2x the einsum (42 vs 81 us at batch 64 x 256
x 768).  It is NOT wired as the encoder default: pooling is <0.3% of the
encoder forward, and the kernel is forward-only (no autodiff) -- use it on
inference paths where the pooling itself is hot.

Long sequences tile over t: an untiled [8, 512, 768] f32 block is ~12.6 MB
and blows the ~16 MB VMEM budget once double-buffered, so blocks larger
than _VMEM_BLOCK_BYTES split into t-chunks accumulated in the output block
(f32 partial sums add in t order, preserving the exact-equality parity
with the einsum's sequential MXU accumulation).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .pallas_util import round_up as _round_up

# proven-compiling block budget: the measured 64x256x768 config runs 6.3 MB
# hidden blocks with grid double-buffering
_VMEM_BLOCK_BYTES = 6_500_000


def _pool_kernel(hidden_ref, sent_ids_ref, sums_ref, *, s_pad: int):
    """Block (i, j): hidden [8, TT, H]; sent_ids [8, TT] -> accumulate
    partial sentence sums into sums [8, S_pad, H] (same block for all j)."""
    hidden = hidden_ref[...]                     # [8, TT, H]
    sent_ids = sent_ids_ref[...]                 # [8, TT]
    bb, tt, _ = hidden.shape
    # one-hot [8, S_pad, TT] built in VMEM: row s selects tokens of sentence s
    rows = jax.lax.broadcasted_iota(jnp.int32, (bb, s_pad, tt), 1)
    one_hot = (rows == sent_ids[:, None, :]).astype(hidden.dtype)
    part = jax.lax.dot_general(
        one_hot, hidden,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)      # [8, S_pad, H]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        sums_ref[...] = part

    @pl.when(pl.program_id(1) > 0)
    def _acc():
        sums_ref[...] += part


@partial(jax.jit, static_argnames=("max_sents", "interpret"))
def sentence_pool_pallas(hidden: jax.Array, sent_ids: jax.Array,
                         max_sents: int, interpret: bool = False) -> jax.Array:
    """Drop-in replacement for models.encoders.sentence_pool.

    hidden: [b, t, h]; sent_ids: i32[b, t] (-1 outside sentences).
    Returns f32[b, max_sents, h].
    """
    b, t, h = hidden.shape
    s_pad = _round_up(max(max_sents, 8), 8)
    bb = 8  # examples per block (sublane-aligned sent_ids blocks)
    b_pad = _round_up(b, bb)
    bytes_per_t = bb * h * hidden.dtype.itemsize
    if t * bytes_per_t <= _VMEM_BLOCK_BYTES:
        tt = t
    else:
        tt = max(128, _VMEM_BLOCK_BYTES // bytes_per_t // 128 * 128)
    t_pad = _round_up(t, tt)
    if b_pad != b or t_pad != t:
        hidden = jnp.pad(hidden, ((0, b_pad - b), (0, t_pad - t), (0, 0)))
        sent_ids = jnp.pad(sent_ids, ((0, b_pad - b), (0, t_pad - t)),
                           constant_values=-1)
    sums = pl.pallas_call(
        partial(_pool_kernel, s_pad=s_pad),
        grid=(b_pad // bb, t_pad // tt),
        in_specs=[
            pl.BlockSpec((bb, tt, h), lambda i, j: (i, j, 0)),
            pl.BlockSpec((bb, tt), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((bb, s_pad, h), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b_pad, s_pad, h), jnp.float32),
        interpret=interpret,
    )(hidden, sent_ids)
    # token counts per sentence are t*s work -- negligible next to the
    # t*s*h MXU pass, so XLA computes them and the divide outside the kernel
    counts = jnp.sum(
        (sent_ids[:, :, None] ==
         jnp.arange(s_pad, dtype=jnp.int32)[None, None, :]).astype(jnp.float32),
        axis=1)                                   # [b_pad, s_pad]
    out = sums / jnp.maximum(counts, 1.0)[:, :, None]
    return out[:b, :max_sents, :]
