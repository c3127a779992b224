"""Pallas TPU kernel: fused l2max corpus scan (measured SLOWER -- not wired).

First-stage retrieval = read the whole sentence matrix once and emit one
score per document.  This kernel streams dense bucket blocks HBM->VMEM,
runs the [BD*S, D] x [D, Q] dot on the MXU, and reduces to per-doc scores
entirely in VMEM -- only [BD] scores leave.

MEASURED OUTCOME (docs/design.md "first-stage scan bandwidth"): the XLA
dense-bucket einsum+max path reaches 721 GB/s on v5e -- XLA fuses the max
into the matmul epilogue, so the [n, s, q] tensor never round-trips HBM --
while this kernel plateaus at 520 GB/s (block-boundary stalls).  The
production path is index/dense.py; this kernel is kept as the documented
negative result, NOT as an optimization to wire in.

score(doc) = max over (sent, query-sent) of (2 q.x - |x|^2 - |q|^2);
the |q|^2 constant and the sqrt are applied by the caller (ordering-safe).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _scan_kernel(x_ref, q_ref, norms_ref, out_ref, *, bd: int, s: int, q_n: int):
    """x: [BD, S, D] bf16; q: [D, Qpad]; norms: [BD, S] f32.

    out: [8, BD] f32 per-doc max scores broadcast over sublanes.
    """
    sims = jax.lax.dot_general(
        x_ref[...], q_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BD, S, Qpad]
    scores3 = 2.0 * sims - norms_ref[...][:, :, None]
    # mask padded query columns
    qmask = jax.lax.broadcasted_iota(jnp.int32, scores3.shape, 2) < q_n
    scores3 = jnp.where(qmask, scores3, NEG)
    # reduce keeping everything >= 2-D (Mosaic layouts dislike 1-D temps);
    # [8, BD] output tile (8-sublane minimum), caller reads row 0
    per_sent = jnp.max(scores3, axis=2)                    # [BD, S]
    per_doc = jnp.max(per_sent, axis=1, keepdims=True)     # [BD, 1]
    out_ref[...] = jnp.broadcast_to(per_doc.T, (8, bd))


@partial(jax.jit, static_argnames=("q_n", "block_docs", "interpret"))
def fused_l2max_scan(sents: jax.Array, q: jax.Array, norms: jax.Array,
                     q_n: int, block_docs: int = 128,
                     interpret: bool = False) -> jax.Array:
    """Per-doc max-similarity scores over one dense bucket.

    sents: [N, S, D] (bf16/f32), N divisible by block_docs, D mult of 128.
    q: [Qpad, D] query sentence matrix (Qpad >= q_n, mult of 8).
    norms: [N, S] f32 squared sentence norms (+inf at pads).
    Returns f32[N] of max(2 q.x - |x|^2); add -|q|^2 and sqrt outside.
    """
    n, s, d = sents.shape
    assert n % block_docs == 0, (n, block_docs)
    qpad = q.shape[0]
    q_t = q.astype(sents.dtype).T  # [D, Qpad]

    grid = (n // block_docs,)
    kernel = partial(_scan_kernel, bd=block_docs, s=s, q_n=q_n)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_docs, s, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((d, qpad), lambda i: (0, 0)),
            pl.BlockSpec((block_docs, s), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((8, block_docs), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(sents, q_t, norms)
    return out[0]
