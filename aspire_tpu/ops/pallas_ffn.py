"""Fused BERT FFN forward: dense(h->4h) -> exact gelu -> dense(4h->h) with
the [rows, 4h] intermediate VMEM-resident.

The reference's encoder spends its largest single train-step component in
the FFN (HF BertIntermediate/BertOutput inside the encoder the whole system
sits on, reference disent_models.py:506): XLA cannot fuse through matmuls,
so the naive pair materializes the [tokens, 4h] intermediate through HBM
(~380 MB of forward traffic per BERT-base layer at the reference train
shape).  This kernel computes both matmuls per row block with the
intermediate living only in VMEM.

Measured on v5e at the train shape (benchmarks/ffn_bench.py, RESULTS_r5):

  * no-grad forward: kernel 1.85 ms vs naive XLA 2.49 ms (1.45x at the
    1.15 ms MXU floor + mandatory in/out traffic)
  * TWO backward treatments were built and measured SLOWER than naive
    XLA's stored-activation fwd+bwd (5.00 ms): a full recompute kernel
    (dw accumulated in VMEM across a sequential grid) at 6.24 ms -- the
    recompute adds a mandatory extra first-matmul (+1.15 ms) that the
    ~0.5 ms of saved HBM traffic cannot repay -- and a store-pre kernel
    forward + XLA five-matmul backward at 5.37 ms.  The
    recompute-beats-store trade that won for attention (RESULTS_r3) LOSES
    here: attention's backward was bandwidth-bound, the FFN's is
    FLOP-bound and already AT its floor (bwd 2.51 ms vs 2.30 MXU floor).

So the policy is split by custom_vjp: the PRIMAL (called only when not
differentiating -- encode, eval, serving) runs the fused kernel for the
full 1.45x; under grad the forward runs the plain XLA composition and the
backward the standard five matmuls, i.e. exact naive-path speed.  Training
keeps XLA's floor; inference forwards get the kernel.

gelu is the exact (erf) variant, with erf built from Mosaic-lowerable
primitives (A&S 7.1.26, |err| <= 1.5e-7 -- the erf primitive has no Pallas
TPU lowering); the XLA backward uses the same polynomial so fwd/bwd
derivatives are mutually consistent.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _erf(x):
    """erf from Mosaic-lowerable primitives (the erf primitive itself has
    no Pallas TPU lowering): Abramowitz & Stegun 7.1.26, |abs err| <=
    1.5e-7 -- far below bf16 resolution and the f32 activation noise
    floor, so the kernel remains 'exact-gelu' for parity purposes."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu(pre):
    """Exact (erf) gelu in f32 -- HF BertIntermediate's 'gelu'."""
    return 0.5 * pre * (1.0 + _erf(pre * _INV_SQRT2))


def _gelu_and_grad(pre):
    """(gelu(pre), gelu'(pre)) in f32.

    d/dx [x * Phi(x)] = Phi(x) + x * phi(x) with Phi the standard normal
    CDF (the 0.5(1+erf(x/sqrt2)) factor) and phi its density."""
    cdf = 0.5 * (1.0 + _erf(pre * _INV_SQRT2))
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * pre * pre)
    return pre * cdf, cdf + pre * pdf


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[...]
    pre = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    pre = pre + b1_ref[...].astype(jnp.float32)
    h = _gelu(pre).astype(x.dtype)
    out = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    out = out + b2_ref[...].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


@lru_cache(maxsize=None)
def _build(block_rows: int, interpret: bool):
    """custom_vjp'd fused-forward FFN for a fixed row-block size."""
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel",),
        vmem_limit_bytes=100 * 1024 * 1024)

    def call_fwd(x, w1, b1, w2, b2):
        rows, h = x.shape
        f = w1.shape[1]
        blk = pl.BlockSpec((block_rows, h), lambda i: (i, 0))
        whole = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0))
        return pl.pallas_call(
            _fwd_kernel,
            grid=(rows // block_rows,),
            in_specs=[blk, whole(h, f), whole(1, f), whole(f, h),
                      whole(1, h)],
            out_specs=blk,
            out_shape=jax.ShapeDtypeStruct((rows, h), x.dtype),
            compiler_params=params,
            interpret=interpret,
        )(x, w1, b1, w2, b2)

    @jax.custom_vjp
    def ffn(x, w1, b1, w2, b2):
        # primal: called only when NOT differentiating -> fused kernel
        return call_fwd(x, w1, b1, w2, b2)

    def fwd(x, w1, b1, w2, b2):
        # under grad: plain XLA composition at its measured floor (the
        # polynomial gelu keeps fwd/bwd derivatives mutually consistent)
        pre = (jnp.dot(x, w1) + b1).astype(x.dtype)
        h = _gelu(pre.astype(jnp.float32)).astype(x.dtype)
        out = jnp.dot(h, w2) + b2
        return out.astype(x.dtype), (x, pre, w1, w2)

    def bwd(res, dy):
        # standard five-matmul backward in plain XLA -- measured AT its MXU
        # floor (2.43 vs 2.30 ms at the train shape); a full in-kernel
        # recompute backward measured slower (module docstring)
        x, pre, w1, w2 = res
        h32, dgelu = _gelu_and_grad(pre.astype(jnp.float32))
        h = h32.astype(x.dtype)
        dh = jax.lax.dot_general(dy, w2, (((1,), (1,)), ((), ())))
        dpre = (dh.astype(jnp.float32) * dgelu).astype(x.dtype)
        dx = jax.lax.dot_general(dpre, w1, (((1,), (1,)), ((), ())))
        dw1 = jax.lax.dot_general(x, dpre, (((0,), (0,)), ((), ())))
        db1 = jnp.sum(dpre.astype(jnp.float32), axis=0)
        dw2 = jax.lax.dot_general(h, dy, (((0,), (0,)), ((), ())))
        db2 = jnp.sum(dy.astype(jnp.float32), axis=0)
        return (dx.astype(x.dtype), dw1.astype(w1.dtype),
                db1.astype(dy.dtype).reshape(1, -1),
                dw2.astype(w2.dtype),
                db2.astype(dy.dtype).reshape(1, -1))

    ffn.defvjp(fwd, bwd)
    return ffn


def _pick_block_rows(rows: int, dtype) -> int:
    """Row-block size: 512 rows x 4h f32 intermediate is ~6 MB VMEM (well
    inside budget with double buffering); small inputs run as one
    sublane-padded block."""
    sub = 16 if dtype == jnp.bfloat16 else 8
    if rows >= 512:
        return 512
    return -(-rows // sub) * sub


def fused_ffn(x, w1, b1, w2, b2, *, interpret: bool = False) -> jax.Array:
    """gelu-FFN with the [rows, 4h] intermediate VMEM-resident forward.

    x:  [..., h] compute dtype (bf16/f32); flattened to [rows, h].
    w1: [h, f], b1: [f], w2: [f, h], b2: [h] -- pass them in the COMPUTE
        dtype (the caller mirrors nn.Dense's promote-to-dtype); gradients
        come back in that dtype.
    Differentiable via custom_vjp with a measured split policy: only
    no-grad calls (encode/eval/serving) run the kernel (1.45x); under grad
    both the forward and the five-matmul backward are plain XLA, which is
    measured AT its floor -- two kernel-backward variants measured slower
    (module docstring).
    """
    shape = x.shape
    h = shape[-1]
    f = w1.shape[1]
    assert w1.shape == (h, f) and w2.shape == (f, h), (w1.shape, w2.shape)
    assert b1.shape == (f,) and b2.shape == (h,), (b1.shape, b2.shape)
    rows = int(np.prod(shape[:-1]))
    x2 = x.reshape(rows, h)
    br = _pick_block_rows(rows, x.dtype)
    pad = (-rows) % br
    if pad:
        # zero rows are exact no-ops: dy pads are zero too, so their
        # dpre/dw/db contributions vanish and padded dx rows are sliced off
        x2 = jnp.concatenate([x2, jnp.zeros((pad, h), x.dtype)])
    fn = _build(int(br), bool(interpret))
    out = fn(x2, w1, b1.reshape(1, f), w2, b2.reshape(1, h))
    if pad:
        out = out[:rows]
    return out.reshape(shape)
