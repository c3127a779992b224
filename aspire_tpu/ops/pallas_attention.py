"""Pallas TPU kernel: fused attention, with optional in-VMEM dropout.

Why this exists (measured on v5e at the train shape, benchmarks/
encoder_bisect.py -- with input-serialized, full-gradient timing; the
round-3 microbench readings that called naive no-dropout attention "at the
FLOP bound" suffered loop-invariant hoisting + dead-code elimination and
were badly understated, see RESULTS_r4): XLA's naive attention
materializes the [b,h,t,t] f32 scores and bf16 probs through HBM every
pass, and dropout adds the mask bits and dropped probs on top (~0.9
ms/call with threefry key generation at the train shape).

This kernel keeps the entire score -> softmax -> [dropout ->] context
pipeline for one (batch, head-block) pair resident in VMEM.  With
dropout_p > 0 the bits come from the TPU core's hardware PRNG
(pltpu.prng_random_bits), so neither the probs nor the mask ever touch
HBM; the backward pass recomputes them (same seed -> bit-identical mask)
instead of storing residuals -- the custom_vjp saves only q/k/v/bias.
With dropout_p == 0 the dropout machinery is compiled out entirely and
this is plain fused attention -- what deterministic passes run by default
on TPU (models/bert.py _select_impl 'fused_det').

Semantics mirror the naive path exactly (models/bert.py BertSelfAttention,
reference HF BertSelfAttention / disent_models.py:229):

    scores = (q @ k^T) * sm_scale + bias          # f32
    probs  = softmax(scores, -1).astype(dtype)    # compute dtype (bf16/f32)
    probs  = where(keep, probs / (1-p), 0)        # keep ~ Bernoulli(1-p)
    ctx    = probs @ v                            # f32 accumulate

with keep drawn as (uniform_bits >= round(p * 2**32)) -- the same
P(keep) = 1-p as `jax.random.bernoulli` to within 2**-32, but a different
(hardware) bit stream: a 'fused' run is deterministic per seed yet not
bit-reproducible against a 'naive' threefry/rbg run, exactly the trade the
`--fast-rng` flag already makes (train/trainer.py).

Testing: the TPU interpreter stubs prng_random_bits to zeros, so the kernel
also takes an explicit `rng_bits` operand ([b, h, t, t] uint32).  CPU tests
drive that mode (interpret=True) against `dropout_attention_reference` with
the identical bits -- the PRNG fast path differs only in where bits come
from and is validated on chip (tests/test_pallas_attention.py + the on-chip
parity runs recorded in RESULTS).
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _keep_threshold(dropout_p: float) -> int:
    """uint32 threshold: drop when bits < thresh; P(keep) = 1 - p (+-2^-32)."""
    return int(round(float(dropout_p) * 2.0 ** 32))


def dropout_attention_reference(q, k, v, bias, keep, dropout_p: float,
                                sm_scale: float):
    """Pure-jnp oracle: the naive path with an EXPLICIT keep mask.

    q/k/v: [b, h, t, hd] (compute dtype); bias: [b, t] f32 additive;
    keep: bool [b, h, t, t].  Differentiable -- tests autodiff this and
    compare against the kernel's custom_vjp.
    """
    dtype = q.dtype
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32)
    s = s * sm_scale + bias[:, None, None, :]
    probs = jax.nn.softmax(s, axis=-1).astype(dtype)
    probs = jnp.where(keep, probs / jnp.asarray(1.0 - dropout_p, dtype), 0)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(dtype), v,
                     preferred_element_type=jnp.float32)
    return ctx.astype(dtype)


def _recompute_probs(q, k, bias_row, keep, dropout_p, sm_scale, dtype):
    """Shared fwd math on one [t, hd] head: (probs_f32, dropped_probs).

    keep=None (the dropout_p == 0 deterministic build) skips the mask/scale
    entirely -- the kernel is then plain fused attention."""
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
    s = s * sm_scale + bias_row          # [t, t] + [1, t]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)          # f32
    if keep is None:
        return probs, probs.astype(dtype)
    pd = probs.astype(dtype) / jnp.asarray(1.0 - dropout_p, dtype)
    pd = jnp.where(keep, pd, 0).astype(dtype)
    return probs, pd


def _seed_program(seed_ref, site: int):
    """Seed the hardware PRNG once per program; heads inside the program
    then draw sequentially from the stream (same order fwd and bwd ->
    bit-identical masks).  Mosaic caps prng_seed at 2 words, so the static
    per-call-site counter (bits 20+, disambiguating layers whose 32-bit key
    folds collide) and the (batch, head-block) grid position fold into
    one."""
    pltpu.prng_seed(seed_ref[0],
                    (site << 20)
                    + pl.program_id(0) * pl.num_programs(1)
                    + pl.program_id(1))


def _draw_keep(bits_ref, jj: int, t: int, thresh: int):
    """keep mask for head jj of this program: from the rng_bits operand
    when present, else the next (t, t) draw from the program's PRNG
    stream."""
    if bits_ref is not None:
        bits = bits_ref[0, jj]
    else:
        bits = pltpu.bitcast(pltpu.prng_random_bits((t, t)), jnp.uint32)
    return bits >= jnp.uint32(thresh)


def _fwd_kernel(seed_ref, bias_ref, q_ref, k_ref, v_ref, *rest,
                dropout_p: float, sm_scale: float, hpb: int, site: int):
    # refs arrive inputs-first: (... [, bits_ref], o_ref)
    bits_ref, o_ref = rest if len(rest) == 2 else (None, rest[0])
    t = q_ref.shape[2]
    dtype = q_ref.dtype
    if bits_ref is None and dropout_p > 0.0:
        _seed_program(seed_ref, site)
    for jj in range(hpb):
        keep = (None if dropout_p == 0.0 else
                _draw_keep(bits_ref, jj, t, _keep_threshold(dropout_p)))
        _, pd = _recompute_probs(q_ref[0, jj], k_ref[0, jj], bias_ref[0],
                                 keep, dropout_p, sm_scale, dtype)
        ctx = jax.lax.dot_general(pd, v_ref[0, jj], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.DEFAULT)
        o_ref[0, jj] = ctx.astype(dtype)


def _bwd_kernel(seed_ref, bias_ref, q_ref, k_ref, v_ref, g_ref, *rest,
                dropout_p: float, sm_scale: float, hpb: int, site: int):
    # refs arrive inputs-first: (... [, bits_ref], dq_ref, dk_ref, dv_ref)
    bits_ref = rest[0] if len(rest) == 4 else None
    dq_ref, dk_ref, dv_ref = rest[-3:]
    t = q_ref.shape[2]
    dtype = q_ref.dtype
    if bits_ref is None and dropout_p > 0.0:
        _seed_program(seed_ref, site)
    for jj in range(hpb):
        q, k, v, g = q_ref[0, jj], k_ref[0, jj], v_ref[0, jj], g_ref[0, jj]
        keep = (None if dropout_p == 0.0 else
                _draw_keep(bits_ref, jj, t, _keep_threshold(dropout_p)))
        probs, pd = _recompute_probs(q, k, bias_ref[0], keep,
                                     dropout_p, sm_scale, dtype)
        # dv = pd^T @ g
        dv = jax.lax.dot_general(pd, g, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.DEFAULT)
        # d(dropped probs) = g @ v^T, then the dropout mask/scale transpose
        dpd = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.DEFAULT)
        dprobs = (dpd if keep is None else
                  jnp.where(keep, dpd / jnp.float32(1.0 - dropout_p), 0.0))
        # softmax vjp on the f32 probs
        ds = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1,
                                       keepdims=True))
        ds = (ds * jnp.float32(sm_scale)).astype(dtype)
        dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.DEFAULT)
        dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.DEFAULT)
        dq_ref[0, jj] = dq.astype(dtype)
        dk_ref[0, jj] = dk.astype(dtype)
        dv_ref[0, jj] = dv.astype(dtype)


def _specs(t, hd, hpb):
    head = lambda: pl.BlockSpec((1, hpb, t, hd), lambda i, j: (i, j, 0, 0))
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                 # seed [1]
        # bias rides as [b, 1, t]: a (1, t) block of a [b, t] array violates
        # the sublane tiling rule (dim -2 must be 8-divisible or whole)
        pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0)),       # bias row
        head(), head(), head(),                                # q, k, v
    ]
    bits_spec = pl.BlockSpec((1, hpb, t, t), lambda i, j: (i, j, 0, 0))
    return in_specs, bits_spec, head


@lru_cache(maxsize=None)
def _build(dropout_p: float, sm_scale: float, use_bits: bool,
           interpret: bool, hpb: int, site: int):
    """custom_vjp'd fused attention for fixed (p, scale, bits-mode, hpb,
    site)."""

    kw = dict(dropout_p=dropout_p, sm_scale=sm_scale, hpb=hpb, site=site)
    params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=100 * 1024 * 1024)

    def call_fwd(q, k, v, bias, seed, bits):
        b, nh, t, hd = q.shape
        in_specs, bits_spec, head = _specs(t, hd, hpb)
        ops = (seed, bias, q, k, v)
        if use_bits:
            in_specs.append(bits_spec)
            ops = ops + (bits,)
        return pl.pallas_call(
            partial(_fwd_kernel, **kw),
            grid=(b, nh // hpb),
            in_specs=in_specs,
            out_specs=head(),
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            compiler_params=params,
            interpret=interpret,
        )(*ops)

    def call_bwd(q, k, v, bias, seed, bits, g):
        b, nh, t, hd = q.shape
        in_specs, bits_spec, head = _specs(t, hd, hpb)
        in_specs.append(head())                                # g
        ops = (seed, bias, q, k, v, g)
        if use_bits:
            in_specs.append(bits_spec)
            ops = ops + (bits,)
        shp = jax.ShapeDtypeStruct(q.shape, q.dtype)
        return pl.pallas_call(
            partial(_bwd_kernel, **kw),
            grid=(b, nh // hpb),
            in_specs=in_specs,
            out_specs=(head(), head(), head()),
            out_shape=(shp, shp, shp),
            compiler_params=params,
            interpret=interpret,
        )(*ops)

    @jax.custom_vjp
    def attn(q, k, v, bias, seed, bits):
        return call_fwd(q, k, v, bias, seed, bits)

    def fwd(q, k, v, bias, seed, bits):
        return call_fwd(q, k, v, bias, seed, bits), (q, k, v, bias, seed, bits)

    def bwd(res, g):
        q, k, v, bias, seed, bits = res
        dq, dk, dv = call_bwd(q, k, v, bias, seed, bits, g)
        return dq, dk, dv, jnp.zeros_like(bias), None, None

    attn.defvjp(fwd, bwd)
    return attn


def fused_dropout_attention(q, k, v, bias, seed, *, dropout_p: float,
                            sm_scale: float, rng_bits: jax.Array | None = None,
                            interpret: bool = False,
                            heads_per_block: int | None = None,
                            site: int = 0) -> jax.Array:
    """Fused scores+softmax+dropout+context, nothing intermediate in HBM.

    q, k, v: [b, nh, t, hd] compute dtype (bf16 or f32).
    bias:    [b, t] f32 additive key mask (0 at real tokens, -1e9 at pads).
    seed:    int32 [1] -- per-call stream seed (fold the layer/micro rng key
             down to one int; each (batch, head) program reseeds with
             (seed, site<<20 | grid position)).  Ignored when rng_bits is
             given.
    site:    static per-call-site (layer) counter < 2**11 so two layers whose
             32-bit key folds collide still draw distinct streams.
    rng_bits: optional uint32 [b, nh, t, t] pre-drawn bits -- the testable /
             non-TPU path (the TPU interpreter stubs the hardware PRNG).
    dropout_p / sm_scale: static; p must be in [0, 1).

    heads_per_block: heads processed per grid program (must divide nh).
    Default: the largest divisor of nh that is <= 4 -- per-program launch
    overhead dominates the tiny per-head matmuls at BERT shapes (measured
    ~1.4 us/program on v5e), while large blocks inflate the double-buffered
    VMEM footprint; 4 balances both at [*, 12, 512, 64].

    Differentiable in q, k, v (custom_vjp; backward recomputes probs and the
    mask from the same seed instead of storing [b, h, t, t] residuals).
    """
    assert 0.0 <= dropout_p < 1.0, dropout_p
    assert q.ndim == 4 and q.shape == k.shape == v.shape, (q.shape, k.shape)
    assert bias.shape == (q.shape[0], q.shape[2]), bias.shape
    use_bits = rng_bits is not None
    if use_bits:
        assert rng_bits.dtype == jnp.uint32, rng_bits.dtype
        b, nh, t, _ = q.shape
        assert rng_bits.shape == (b, nh, t, t), rng_bits.shape
    seed = jnp.reshape(jnp.asarray(seed), (1,))
    if seed.dtype == jnp.uint32:
        # bitcast, not convert: u32->s32 value conversion can saturate and
        # collapse half the seed space
        seed = jax.lax.bitcast_convert_type(seed, jnp.int32)
    else:
        seed = seed.astype(jnp.int32)
    nh = q.shape[1]
    if heads_per_block is None:
        heads_per_block = max(h for h in range(1, min(nh, 4) + 1)
                              if nh % h == 0)
    assert nh % heads_per_block == 0, (nh, heads_per_block)
    # site shares the second seed word above bit 20; the grid position must
    # stay below it (b * head_blocks is a few hundred at BERT shapes)
    assert 0 <= site < (1 << 11), site
    assert q.shape[0] * (nh // heads_per_block) < (1 << 20), q.shape
    fn = _build(float(dropout_p), float(sm_scale), use_bits, bool(interpret),
                int(heads_per_block), int(site))
    bits = rng_bits if use_bits else jnp.zeros((1,), jnp.uint32)
    bias = jnp.asarray(bias, jnp.float32)[:, None, :]
    return fn(q, k, v, bias, seed, bits)
