"""Pallas TPU kernel: elementwise dropout with in-VMEM hardware-PRNG bits.

Why this exists (measured on v5e, benchmarks/train_bench.py round 4): after
the fused dropout-attention kernel (ops/pallas_attention.py) removed the
[b, h, t, t] attention-prob mask traffic, the remaining dropout cost in the
flagship train step is the HIDDEN dropout — 25 sites per encoder pass
(embeddings output + 2 per layer, reference HF BertModel semantics /
disent_models.py:229): each generates a [b, t, 768] mask with the step's
PRNG and keeps it live for the backward, so the bits are materialized
through HBM twice (fwd produce, bwd consume) on top of the generation cost.

This kernel draws the keep mask from the TPU core's hardware PRNG
(pltpu.prng_random_bits) inside the same program that applies it, and the
custom_vjp backward RE-SEEDS the identical stream instead of storing
anything — zero residuals, so the fwd is a pure read-x/write-out stream and
the bwd a pure read-g/write-dx stream (the HBM floor for an elementwise op).

Semantics match `flax.linen.Dropout` exactly up to the bit stream:

    keep ~ Bernoulli(1 - p)   as (uniform_bits >= round(p * 2**32))
    out  = where(keep, x / (1 - p), 0)

deterministic per seed, not bit-reproducible against a threefry/rbg
`nn.Dropout` run — the same trade `--fast-rng` and `--attention-impl fused`
already make (train/trainer.py, models/bert.py).

Testing: the TPU interpreter stubs prng_random_bits to zeros, so the kernel
also takes an explicit `rng_bits` operand ([rows, h] uint32); CPU tests
drive that mode (interpret=True) against the jnp oracle with identical bits
(tests/test_pallas_dropout.py), and the PRNG fast path is validated on chip
(keep-rate / same-seed-bit-identical / p=0 probes, RESULTS_r4.md).
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


def dropout_reference(x, keep, dropout_p: float):
    """Pure-jnp oracle with an EXPLICIT keep mask (differentiable)."""
    scale = jnp.asarray(1.0 / (1.0 - dropout_p), x.dtype)
    return jnp.where(keep, x * scale, jnp.zeros((), x.dtype))


def _apply_kernel(seed_ref, x_ref, *rest, dropout_p: float, site: int):
    """out = where(keep, x/(1-p), 0); used for BOTH fwd (x) and bwd (g) —
    dropout's vjp is the same masked scale applied to the cotangent.

    `site` is a STATIC per-call-site counter folded into the second seed
    word (bits 16+) alongside program_id: two sites whose 32-bit key folds
    collide (birthday effect over ~25 sites/step on long runs) still draw
    distinct hardware-PRNG streams."""
    bits_ref, o_ref = rest if len(rest) == 2 else (None, rest[0])
    if bits_ref is not None:
        bits = bits_ref[...]
    else:
        pltpu.prng_seed(seed_ref[0], (site << 16) + pl.program_id(0))
        bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
    keep = bits >= jnp.uint32(_keep_threshold(dropout_p))
    x = x_ref[...]
    scale = jnp.asarray(1.0 / (1.0 - dropout_p), x.dtype)
    o_ref[...] = jnp.where(keep, x * scale, jnp.zeros((), x.dtype))


def _block_rows(rows: int, dtype, h: int, max_vmem: int = 8 << 20) -> int:
    """Largest sublane-legal divisor of `rows` within a VMEM budget.

    Blocks must be whole along dim -2 or a multiple of the dtype sublane
    count (8 f32 / 16 bf16); cap the block so in+out double-buffering stays
    comfortably inside VMEM.  Callers pad `rows` to a sublane multiple
    (hw_dropout), so a legal block <= cap always exists (b = sub divides
    rows and the cap is far above sub for any realistic h); the whole-block
    fallback therefore only fires when it genuinely fits the budget, and we
    assert that loudly rather than compile a VMEM-busting block."""
    sub = 16 if dtype == jnp.bfloat16 else 8
    cap = max(1, max_vmem // (2 * h * jnp.dtype(dtype).itemsize))
    for b in range(min(rows, cap), 0, -1):
        if rows % b == 0 and b % sub == 0:
            return b
    assert rows * h * jnp.dtype(dtype).itemsize * 2 <= max_vmem, (
        f"dropout block [{rows}, {h}] {jnp.dtype(dtype).name} has no "
        f"sublane-aligned divisor within the {max_vmem >> 20} MiB VMEM "
        f"budget; pad rows to a multiple of {sub} before the kernel")
    return rows  # whole-block fallback, proven to fit


@lru_cache(maxsize=None)
def _build(dropout_p: float, use_bits: bool, interpret: bool, site: int):
    """custom_vjp'd hardware-PRNG dropout for fixed (p, bits-mode, site)."""

    def call(x, seed, bits):
        rows, h = x.shape
        br = _block_rows(rows, x.dtype, h)
        assert rows // br < (1 << 16), (rows, br)  # program_id shares word 2
        blk = pl.BlockSpec((br, h), lambda i: (i, 0))
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), blk]
        ops = (seed, x)
        if use_bits:
            in_specs.append(blk)
            ops = ops + (bits,)
        return pl.pallas_call(
            partial(_apply_kernel, dropout_p=dropout_p, site=site),
            grid=(rows // br,),
            in_specs=in_specs,
            out_specs=blk,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(*ops)

    @jax.custom_vjp
    def drop(x, seed, bits):
        return call(x, seed, bits)

    def fwd(x, seed, bits):
        # residuals: the seed (and explicit bits) only — never x or the mask
        return call(x, seed, bits), (seed, bits)

    def bwd(res, g):
        seed, bits = res
        return call(g, seed, bits), None, None

    drop.defvjp(fwd, bwd)
    return drop


def hw_dropout(x, seed, *, dropout_p: float,
               rng_bits: jax.Array | None = None,
               interpret: bool = False, site: int = 0) -> jax.Array:
    """Dropout with hardware-PRNG bits; nothing mask-shaped touches HBM.

    x:        [..., h] compute dtype (bf16/f32); flattened to [rows, h].
    seed:     int32/uint32 [1] per-call stream seed (fold the site's rng key
              down to one word; each grid program reseeds with
              (seed, site<<16 | program_id)).  Ignored when rng_bits is given.
    site:     static per-call-site counter (e.g. 2*layer+k) disambiguating
              sites whose 32-bit key folds collide.  Must be < 2**15.
    rng_bits: optional uint32 with x's shape — pre-drawn bits, the testable /
              non-TPU path (the TPU interpreter stubs the hardware PRNG).
    dropout_p: static, in [0, 1).

    Differentiable in x (custom_vjp: the backward re-seeds the same stream
    and applies the identical mask to the cotangent; zero residuals).
    """
    assert 0.0 <= dropout_p < 1.0, dropout_p
    if dropout_p == 0.0:
        return x
    shape = x.shape
    h = shape[-1]
    rows = 1
    for d in shape[:-1]:
        rows *= d
    x2 = x.reshape(rows, h)
    use_bits = rng_bits is not None
    # pad rows to the dtype sublane multiple: guarantees _block_rows a legal
    # small divisor, so odd/prime row counts never force a whole-[rows, h]
    # VMEM block (hot-path shapes are b*t rows, already aligned -> no-op)
    sub = 16 if x.dtype == jnp.bfloat16 else 8
    pad = (-rows) % sub
    if pad:
        x2 = jnp.concatenate([x2, jnp.zeros((pad, h), x.dtype)])
    if use_bits:
        assert rng_bits.dtype == jnp.uint32, rng_bits.dtype
        assert rng_bits.shape == shape, (rng_bits.shape, shape)
        bits = rng_bits.reshape(rows, h)
        if pad:
            # pad with keep-everything bits (max u32 >= any threshold)
            bits = jnp.concatenate(
                [bits, jnp.full((pad, h), 0xFFFFFFFF, jnp.uint32)])
    else:
        bits = jnp.zeros((1,), jnp.uint32)
    seed = jnp.reshape(jnp.asarray(seed), (1,))
    if seed.dtype == jnp.uint32:
        # bitcast, not convert: u32->s32 value conversion can saturate and
        # collapse half the seed space
        seed = jax.lax.bitcast_convert_type(seed, jnp.int32)
    else:
        seed = seed.astype(jnp.int32)
    assert 0 <= site < (1 << 15), site
    fn = _build(float(dropout_p), use_bits, bool(interpret), int(site))
    out = fn(x2, seed, bits)
    if pad:
        out = out[:rows]
    return out.reshape(shape)
