"""Pallas TPU kernels: fused l2max corpus scans.

Two kernels with opposite verdicts:
  * bf16 single-query (`fused_l2max_scan`): measured SLOWER than XLA --
    kept as a documented negative result, not wired (see below).
  * int8 batched (`fused_l2max_scan_int8_batched`): targets the case where
    the XLA path measurably loses (the dequant multiply blocks epilogue
    fusion; see the section comment below) -- wire-in gated on an on-chip
    win, same discipline as the FFN kernel (ops/pallas_ffn.py).

First-stage retrieval = read the whole sentence matrix once and emit one
score per document.  These kernels stream dense bucket blocks HBM->VMEM,
run the [BD*S, D] x [D, Q] dot on the MXU, and reduce to per-doc scores
entirely in VMEM -- only per-doc maxima leave.

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


# ---------------------------------------------------------------------------
# int8 BATCHED scan: the case where the XLA path genuinely loses.
#
# Measured at the 1M-doc capacity config (RESULTS_r5.md): the XLA batched
# int8 scan (index/dense.py score_buckets_batched) costs 332 ms for B=32
# (10.4 ms/query) because the [n, s, q_chunk, qmax] f32 similarity block
# round-trips HBM -- the per-sentence dequant multiply sits between the
# matmul and the max reduction, so XLA cannot fuse the reduce into the
# matmul epilogue the way it does for the bf16 single-query scan (721 GB/s).
# A bandwidth-bound scan reads the 6.9 GB index ONCE for all 32 queries:
# ~8.4 ms at the 819 GB/s HBM peak, 0.26 ms/query -- ~40x headroom.
#
# This kernel streams flat [rows=N*S, D] int8 blocks into VMEM, dequantizes
# and reduces IN VMEM, and writes only [N, B] per-doc maxima.  Layout notes:
# int8 min tile is (32, 128), so the index is viewed as [N*S, D] (a free
# reshape of the [N, S, D] bucket) and per-row scale/bias vectors carry the
# dequant + norm terms; the per-query group-max over qmax lanes is a static
# unrolled slice loop (lane-dim reshapes are relayouts Mosaic handles worse).
# ---------------------------------------------------------------------------


def _scan_int8_kernel(x_ref, qt_ref, rs_ref, rb_ref, qadd_ref, out_ref, *,
                      bd: int, s: int, b: int, qmax: int):
    """x: [bd*s, D] int8; qt: [D, Qtot] bf16; rs/rb: [bd*s, 1] f32
    (2*scale, -|x|^2 with +inf pads folded to -inf); qadd: [1, Qtot] f32
    (-|q_sent|^2, NEG at padded query sentences); out: [bd, b] f32.
    """
    sims = jax.lax.dot_general(
        x_ref[...].astype(jnp.bfloat16), qt_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # [bd*s, Qtot]
    scores = rs_ref[...] * sims + rb_ref[...] + qadd_ref[...]
    scores = jnp.max(scores.reshape(bd, s, -1), axis=1)  # [bd, Qtot]
    cols = [jnp.max(scores[:, i * qmax:(i + 1) * qmax], axis=1, keepdims=True)
            for i in range(b)]                           # static unroll
    out_ref[...] = jnp.concatenate(cols, axis=1)         # [bd, b]


def _block_docs_int8(n: int, s: int, target_rows: int = 4096) -> int:
    """Largest BD dividing n with BD*s a multiple of 32 and <= target rows."""
    best = 0
    for bd in range(1, n + 1):
        if n % bd or (bd * s) % 32:
            continue
        if bd * s > target_rows and best:
            break
        best = bd
    assert best, (n, s)
    return best


@partial(jax.jit, static_argnames=("qmax", "block_docs", "interpret"))
def fused_l2max_scan_int8_batched(sents: jax.Array, scales: jax.Array,
                                  norms: jax.Array, q: jax.Array,
                                  q_lens: jax.Array, qmax: int,
                                  block_docs: int | None = None,
                                  interpret: bool = False) -> jax.Array:
    """Batched-query int8 l2max scan over one dense bucket.

    sents: int8[N, S, D] (N*S a multiple of 32 after padding -- dense
    buckets pad N to multiples of 8, so S in {4k} always satisfies it; the
    helper picks BD so BD*S % 32 == 0 regardless).
    scales/norms: f32[N, S] per-sentence dequant scale / squared norms
    (+inf at pads).  q: f32[B, qmax, D]; q_lens: i32[B].
    Returns f32[N, B]: per-doc max of (2*scale*(q.x_int) - |x|^2 - |q|^2),
    the same sq-l2max scores as index/dense.score_buckets_batched (NEG at
    padded docs via the +inf norm fold).
    """
    n, s, d = sents.shape
    bsz = q.shape[0]
    bd = block_docs or _block_docs_int8(n, s)
    rows = n * s
    x = sents.reshape(rows, d)
    qf = q.astype(jnp.float32)
    q_norms = jnp.sum(qf * qf, axis=2)                     # [B, qmax]
    qvalid = (jnp.arange(qmax, dtype=jnp.int32)[None, :] < q_lens[:, None])
    qadd = jnp.where(qvalid, -q_norms, NEG).reshape(1, bsz * qmax)
    q_t = qf.reshape(bsz * qmax, d).astype(jnp.bfloat16).T  # [D, Qtot]
    rs = (2.0 * scales).reshape(rows, 1)
    # fold +inf pad norms to a finite NEG so 0*sims - inf never meets
    # another inf downstream (top_k handles NEG like the XLA path)
    rb = jnp.where(jnp.isfinite(norms), -norms, NEG).reshape(rows, 1)

    grid = (n // bd,)
    kernel = partial(_scan_int8_kernel, bd=bd, s=s, b=bsz, qmax=qmax)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bd * s, d), lambda i: (i, 0)),
            pl.BlockSpec((d, bsz * qmax), lambda i: (0, 0)),
            pl.BlockSpec((bd * s, 1), lambda i: (i, 0)),
            pl.BlockSpec((bd * s, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, bsz * qmax), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bd, bsz), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, bsz), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, q_t, rs, rb, qadd)
    return out
