"""Flax BERT encoder (built from scratch, TPU-first).

Replaces the reference's `transformers.AutoModel` usage
(src/learning/facetid_models/disent_models.py:229,506).  Design notes:

  * all dense contractions carry `preferred_element_type=float32` and the
    module takes a `dtype` knob so activations can run in bfloat16 on the MXU
    while params/layernorms stay float32;
  * returns the full tuple of hidden states (embeddings + every layer) so the
    scalar-mix bi-encoder (SoftmaxMixLayers) can weight across layers;
  * attention mask is additive (large negative at pads), folded pre-softmax;
  * static shapes everywhere; the caller buckets sequence lengths.

Parameter tree mirrors HF BERT naming closely so checkpoint conversion
(convert.py) is a mechanical rename.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 31090          # scibert_scivocab_uncased
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1

    @classmethod
    def tiny(cls, **kw) -> "BertConfig":
        """Small config for tests."""
        base = dict(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                    num_attention_heads=4, intermediate_size=64,
                    max_position_embeddings=64)
        base.update(kw)
        return cls(**base)


class BertEmbeddings(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32
    hidden_dropout_impl: str = "auto"

    @nn.compact
    def __call__(self, input_ids, token_type_ids, deterministic=True):
        cfg = self.config
        seq_len = input_ids.shape[1]
        # trace-time guard: an over-long sequence would gather out of the
        # position table's bounds, which XLA CLAMPS -- downstream losses go
        # silently wrong (or NaN) instead of erroring
        assert seq_len <= cfg.max_position_embeddings, (
            f"seq_len {seq_len} exceeds max_position_embeddings "
            f"{cfg.max_position_embeddings}")
        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="word_embeddings",
                        dtype=self.dtype, param_dtype=jnp.float32)(input_ids)
        pos_ids = jnp.arange(seq_len, dtype=jnp.int32)[None, :]
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       name="position_embeddings", dtype=self.dtype,
                       param_dtype=jnp.float32)(pos_ids)
        typ = nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                       name="token_type_embeddings", dtype=self.dtype,
                       param_dtype=jnp.float32)(token_type_ids)
        x = word + pos + typ
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="LayerNorm",
                         dtype=jnp.float32)(x)
        x = _hidden_dropout(self, x, cfg.hidden_dropout_prob, deterministic,
                            self.hidden_dropout_impl)
        return x.astype(self.dtype)


def _hidden_dropout(module: nn.Module, x, p: float, deterministic: bool,
                    impl: str, site: int = 0):
    """Hidden/embedding dropout site with a backend knob.

    'fused' — and 'auto' ON TPU — run ops/pallas_dropout.hw_dropout: the
    keep mask is drawn from the TPU hardware PRNG inside the applying
    kernel and REGENERATED in the backward, so no [b, t, h] mask bits are
    generated with the step PRNG, stored for the bwd, or moved through HBM
    (266.3 -> 211.5 ms/step at the reference config under default threefry
    step keys, RESULTS_r4).  Deterministic per seed, but a different bit
    stream than nn.Dropout; `--bit-reproducible` / 'naive' restores the
    threefry stream.  `site` is a static per-call-site counter folded into
    the kernel's second seed word so two sites whose 32-bit key folds
    collide (birthday effect over ~25 sites/step on long runs) still draw
    distinct streams.

    'naive' — and 'auto' OFF TPU — run `nn.Dropout` (threefry/rbg step
    keys — exact HF semantics, reference HF BertModel /
    disent_models.py:229).  Deterministic passes are identity on every
    backend."""
    if deterministic or p == 0.0:
        return x
    on_tpu = jax.default_backend() == "tpu"
    if not (impl == "fused" or (impl == "auto" and on_tpu)):
        return nn.Dropout(p)(x, deterministic=False)
    from ..ops.pallas_dropout import hw_dropout
    key = module.make_rng("dropout")
    if on_tpu:
        seed, bits = jax.random.bits(key, (1,), jnp.uint32), None
    else:
        # the TPU interpreter stubs the hardware PRNG; draw the bits
        # outside the kernel (CI / CPU path -- same math)
        seed = jnp.zeros((1,), jnp.uint32)
        bits = jax.random.bits(key, x.shape, jnp.uint32)
    return hw_dropout(x, seed, dropout_p=p, rng_bits=bits,
                      interpret=not on_tpu, site=site)


def _select_impl(attention_impl: str, deterministic: bool,
                 dropout_p: float, on_tpu: bool = True) -> str:
    """Backend-selection policy for BertSelfAttention (unit-testable: the
    pallas kernels only lower on TPU, so CI can't exercise the TPU
    branches behaviorally).

    'auto' picks per pass (all measured on v5e at the train shape,
    benchmarks/encoder_bisect.py with input-serialized, full-gradient
    timing -- the round-3 "naive attention is at the FLOP bound" readings
    suffered loop-invariant hoisting + dead-code elimination and were 2-50x
    understated, RESULTS_r4):

      * deterministic (or p=0) passes -> 'fused_det', the pallas kernel
        with the dropout machinery compiled out: the whole score->softmax->
        context pipeline stays VMEM-resident, vs the naive path's [b,h,t,t]
        f32 scores + bf16 probs round-tripping HBM.  Measured 7.85 -> 2.56
        ms per 60-seq attention fwd+bwd (3.1x); the full no-dropout train
        step drops 252.4 -> 193.2 ms (1.31x).
      * dropout TRAINING passes -> 'fused': the same kernel with its
        hardware-PRNG dropout (~43 ms/step rbg, ~105 ms/step threefry saved
        at the reference config; production step 266 -> 207 ms with fused
        hidden dropout, RESULTS_r4).  Deterministic per seed but a
        DIFFERENT mask bit stream than HF/threefry nn.Dropout —
        `--bit-reproducible` (impl 'naive') restores the documented
        threefry streams at the speed cost above.

    'fused' is now equivalent to 'auto' on TPU; off-TPU it additionally
    forces dropout-training passes through the kernel's interpret/bits
    path (CI parity tests).

    'flash' (jax.experimental pallas flash attention) stays available by
    explicit request for long-context derivatives; at every shape reachable
    under BERT's 512-position cap it loses to both paths above.

    Off-TPU (CPU tests / CPU mesh), everything falls back to 'naive': the
    kernels only lower on TPU and interpret mode is for parity tests."""
    if attention_impl == "flash":
        return "flash"
    training_dropout = not deterministic and dropout_p > 0
    if attention_impl == "fused":
        if training_dropout:
            return "fused"
        return "fused_det" if on_tpu else "naive"
    if attention_impl == "auto" and on_tpu:
        return "fused" if training_dropout else "fused_det"
    return "naive"


def _select_ffn(ffn_impl: str, on_tpu: bool = True) -> str:
    """FFN backend policy: 'auto' routes TPU passes through
    ops/pallas_ffn.fused_ffn, whose custom_vjp applies the MEASURED split
    (benchmarks/ffn_bench.py, RESULTS_r5): no-grad forwards run the pallas
    kernel with the [tokens, 4h] intermediate VMEM-resident (1.45x naive),
    while under grad both directions run plain XLA, which is at its MXU
    floor (two kernel-backward variants measured slower).  'fused' forces
    the same path off-TPU (interpret mode -- CI parity); 'naive' forces the
    nn.Dense composition everywhere (--bit-reproducible numerics).  The
    kernel has no RNG; this is a numerics-only knob (f32 pre-activation +
    polynomial exact-gelu, |erf err| <= 1.5e-7)."""
    if ffn_impl == "fused":
        return "fused"
    if ffn_impl == "auto" and on_tpu:
        return "fused"
    return "naive"


class _DenseParams(nn.Module):
    """Declares kernel/bias identically to nn.Dense (same names, shapes,
    f32 param_dtype, lecun-normal/zeros init, same RNG path) WITHOUT the
    matmul -- the fused-FFN path consumes the raw params, and checkpoints
    stay interchangeable with the naive nn.Dense tree."""

    fan_in: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.linear.default_kernel_init,
                       (self.fan_in, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        return k, b


class BertSelfAttention(nn.Module):
    """Self-attention with two backends:

    * 'naive': materialized [b, h, t, t] scores + attention-prob dropout
      (exact HF semantics).
    * 'flash': pallas flash_attention with segment-id padding masks; never
      materializes the score matrix.  NOTE: no attention-prob dropout on this
      path (hidden dropout remains); inference is equivalent to ~1e-3.
    * 'fused': dropout-training passes run ops/pallas_attention.py -- the
      whole scores/softmax/dropout/context pipeline VMEM-resident with
      dropout bits from the TPU hardware PRNG, so neither probs nor masks
      touch HBM (the dominant dropout cost; see _select_impl).  Same
      P(keep) = 1-p semantics, different bit stream: deterministic per
      seed, not bit-reproducible against a 'naive' run
      (`--bit-reproducible` restores naive).
    * 'fused_det': the same kernel built at p=0 (dropout machinery compiled
      out) -- plain fused attention, VMEM-resident, no PRNG.  What 'auto'
      and 'fused' run for deterministic passes on TPU.
    * 'auto' (default): on TPU, 'fused' for dropout-training passes and
      'fused_det' for deterministic ones -- the measured-best path with no
      flags; naive off-TPU (see _select_impl for the measurements).
    """

    config: BertConfig
    dtype: Any = jnp.float32
    attention_impl: str = "auto"
    layer_idx: int = 0

    @nn.compact
    def __call__(self, x, attn_bias, attention_mask, deterministic=True):
        cfg = self.config
        h, nh = cfg.hidden_size, cfg.num_attention_heads
        hd = h // nh
        t = x.shape[1]
        impl = _select_impl(self.attention_impl, deterministic,
                            cfg.attention_probs_dropout_prob,
                            on_tpu=jax.default_backend() == "tpu")
        dense = lambda name: nn.Dense(h, dtype=self.dtype, param_dtype=jnp.float32, name=name)
        q = dense("query")(x).reshape(*x.shape[:2], nh, hd)
        k = dense("key")(x).reshape(*x.shape[:2], nh, hd)
        v = dense("value")(x).reshape(*x.shape[:2], nh, hd)
        if impl in ("fused", "fused_det"):
            from ..ops.pallas_attention import fused_dropout_attention
            on_tpu = jax.default_backend() == "tpu"
            if impl == "fused_det":
                # plain fused attention: the p=0 build compiles the dropout
                # machinery out entirely (no PRNG, no mask) -- no rng needed
                p, seed, bits = 0.0, jnp.zeros((1,), jnp.uint32), None
            else:
                p = cfg.attention_probs_dropout_prob
                key = self.make_rng("dropout")
                if on_tpu:
                    seed, bits = jax.random.bits(key, (1,), jnp.uint32), None
                else:
                    # the TPU interpreter stubs the hardware PRNG; draw the
                    # bits outside the kernel (CI / CPU path -- same math)
                    seed = jnp.zeros((1,), jnp.uint32)
                    bits = jax.random.bits(key, (x.shape[0], nh, t, t),
                                           jnp.uint32)
            ctx = fused_dropout_attention(
                jnp.transpose(q, (0, 2, 1, 3)),
                jnp.transpose(k, (0, 2, 1, 3)),
                jnp.transpose(v, (0, 2, 1, 3)),
                attn_bias[:, 0, 0, :], seed,
                dropout_p=p,
                sm_scale=float(1.0 / np.sqrt(hd)),
                rng_bits=bits, interpret=not on_tpu, site=self.layer_idx)
            ctx = jnp.transpose(ctx, (0, 2, 1, 3))
        elif impl == "flash":
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention, SegmentIds)
            seg = jnp.where(attention_mask > 0, 0, 1).astype(jnp.int32)
            ctx = flash_attention(
                jnp.transpose(q, (0, 2, 1, 3)),
                jnp.transpose(k, (0, 2, 1, 3)),
                jnp.transpose(v, (0, 2, 1, 3)),
                segment_ids=SegmentIds(q=seg, kv=seg),
                causal=False, sm_scale=float(1.0 / np.sqrt(hd)))
            ctx = jnp.transpose(ctx, (0, 2, 1, 3))
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            scores = scores / jnp.sqrt(jnp.float32(hd))
            scores = scores + attn_bias  # [b, 1, 1, k] additive
            probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            probs = nn.Dropout(cfg.attention_probs_dropout_prob)(
                probs, deterministic=deterministic)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                             preferred_element_type=jnp.float32)
        return ctx.reshape(*x.shape[:2], h).astype(self.dtype)


class BertLayer(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32
    attention_impl: str = "auto"
    hidden_dropout_impl: str = "auto"
    layer_idx: int = 0
    ffn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, attn_bias, attention_mask, deterministic=True):
        cfg = self.config
        attn_out = BertSelfAttention(cfg, self.dtype, self.attention_impl,
                                     layer_idx=self.layer_idx,
                                     name="attention_self")(
            x, attn_bias, attention_mask, deterministic)
        attn_out = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                            param_dtype=jnp.float32, name="attention_output_dense")(attn_out)
        attn_out = _hidden_dropout(self, attn_out, cfg.hidden_dropout_prob,
                                   deterministic, self.hidden_dropout_impl,
                                   site=1 + 2 * self.layer_idx)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="attention_output_LayerNorm")(x + attn_out).astype(self.dtype)
        on_tpu = jax.default_backend() == "tpu"
        if _select_ffn(self.ffn_impl, on_tpu) == "fused":
            from ..ops.pallas_ffn import fused_ffn
            w1, b1 = _DenseParams(cfg.hidden_size, cfg.intermediate_size,
                                  name="intermediate_dense")()
            w2, b2 = _DenseParams(cfg.intermediate_size, cfg.hidden_size,
                                  name="output_dense")()
            out = fused_ffn(x, w1.astype(self.dtype), b1.astype(self.dtype),
                            w2.astype(self.dtype), b2.astype(self.dtype),
                            interpret=not on_tpu)
        else:
            inter = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                             param_dtype=jnp.float32,
                             name="intermediate_dense")(x)
            inter = nn.gelu(inter, approximate=False)
            out = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                           param_dtype=jnp.float32, name="output_dense")(inter)
        out = _hidden_dropout(self, out, cfg.hidden_dropout_prob,
                              deterministic, self.hidden_dropout_impl,
                              site=2 + 2 * self.layer_idx)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="output_LayerNorm")(x + out).astype(self.dtype)
        return x


class BertModel(nn.Module):
    """BERT encoder returning all hidden states (embeddings + each layer).

    `__call__` -> (last_hidden_state f32[b, t, h],
                   hidden_states tuple of layer_count+1 arrays).
    """

    config: BertConfig
    dtype: Any = jnp.float32
    attention_impl: str = "auto"
    hidden_dropout_impl: str = "auto"
    ffn_impl: str = "auto"

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None,
                 deterministic: bool = True):
        cfg = self.config
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = BertEmbeddings(cfg, self.dtype, self.hidden_dropout_impl,
                           name="embeddings")(
            input_ids, token_type_ids, deterministic)
        attn_bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9
                              ).astype(jnp.float32)
        hidden_states = [x.astype(jnp.float32)]
        for i in range(cfg.num_hidden_layers):
            x = BertLayer(cfg, self.dtype, self.attention_impl,
                          self.hidden_dropout_impl, layer_idx=i,
                          ffn_impl=self.ffn_impl,
                          name=f"layer_{i}")(
                x, attn_bias, attention_mask, deterministic)
            hidden_states.append(x.astype(jnp.float32))
        return hidden_states[-1], tuple(hidden_states)


class BertPooler(nn.Module):
    """HF BertPooler: tanh(dense(CLS)) — the `pooler_output` head.

    Kept OUTSIDE BertModel's param tree: the framework's own models score
    from hidden states / CLS directly, and only the SimCSE baselines
    (reference utils/models.py:322-357, which encode every sentence and
    return `pooler_output`) need it.  Apply to `last_hidden_state`."""

    config: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, last_hidden_state):
        cls = last_hidden_state[:, 0, :].astype(self.dtype)
        out = nn.Dense(self.config.hidden_size, dtype=self.dtype,
                       param_dtype=jnp.float32, name="dense")(cls)
        return jnp.tanh(out.astype(jnp.float32))
