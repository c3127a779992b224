"""Fused dropout-attention kernel (ops/pallas_attention.py).

CPU CI drives the kernel in interpret mode through the explicit `rng_bits`
operand (the TPU interpreter stubs the hardware PRNG to zeros); the
in-kernel PRNG fast path differs ONLY in where the bits come from and is
validated on chip (RESULTS_r3).  Against the pure-jnp oracle with the SAME
bits, forward and custom_vjp backward must agree to float tolerance.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aspire_tpu.ops.pallas_attention import (
    fused_dropout_attention, dropout_attention_reference, _keep_threshold)

B, NH, T, HD = 2, 3, 64, 16
P = 0.1
SCALE = 1.0 / np.sqrt(HD)


def _inputs(dtype, seed=0):
    ks = jax.random.split(jax.random.key(seed), 5)
    q = jax.random.normal(ks[0], (B, NH, T, HD), dtype)
    k = jax.random.normal(ks[1], (B, NH, T, HD), dtype)
    v = jax.random.normal(ks[2], (B, NH, T, HD), dtype)
    # mask the tail keys of batch row 1 (padding), like real batches
    mask = np.zeros((B, T), np.float32)
    mask[1, T - 9:] = -1e9
    bits = jax.random.bits(ks[3], (B, NH, T, T), jnp.uint32)
    return q, k, v, jnp.asarray(mask), bits


def _run(q, k, v, bias, bits, p=P):
    return fused_dropout_attention(q, k, v, bias, jnp.zeros((1,), jnp.int32),
                                   dropout_p=p, sm_scale=SCALE,
                                   rng_bits=bits, interpret=True)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-5),
                                       (jnp.bfloat16, 2e-2)])
def test_forward_matches_reference(dtype, tol):
    q, k, v, bias, bits = _inputs(dtype)
    keep = bits >= jnp.uint32(_keep_threshold(P))
    got = _run(q, k, v, bias, bits)
    want = dropout_attention_reference(q, k, v, bias, keep, P, SCALE)
    assert got.dtype == dtype
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=tol)
    # the mask actually bites: ~P of the prob mass was dropped somewhere
    nodrop = _run(q, k, v, bias, bits, p=0.0)
    assert not np.allclose(np.asarray(got, np.float32),
                           np.asarray(nodrop, np.float32), atol=1e-3)


def test_grads_match_reference_autodiff():
    q, k, v, bias, bits = _inputs(jnp.float32)
    keep = bits >= jnp.uint32(_keep_threshold(P))
    w = jax.random.normal(jax.random.key(9), (B, NH, T, HD), jnp.float32)

    def loss_kernel(q, k, v):
        return jnp.sum(_run(q, k, v, bias, bits) * w)

    def loss_ref(q, k, v):
        return jnp.sum(dropout_attention_reference(
            q, k, v, bias, keep, P, SCALE) * w)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gk, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                                   err_msg=f"d{name}")


def test_p0_equals_plain_attention():
    """dropout_p=0 reduces the kernel to exact softmax attention."""
    q, k, v, bias, bits = _inputs(jnp.float32)

    def plain(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32)
        s = s * SCALE + bias[:, None, None, :]
        probs = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                          preferred_element_type=jnp.float32)

    got, gk = jax.value_and_grad(
        lambda q: jnp.sum(_run(q, k, v, bias, bits, p=0.0) ** 2))(q)
    want, gw = jax.value_and_grad(lambda q: jnp.sum(plain(q, k, v) ** 2))(q)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gw), atol=2e-5)


def test_keep_rate():
    """The uint32 threshold realizes P(keep) = 1-p."""
    bits = np.asarray(jax.random.bits(jax.random.key(3), (512, 512),
                                      jnp.uint32))
    keep = bits >= np.uint32(_keep_threshold(P))
    assert abs(keep.mean() - (1 - P)) < 5e-3


def test_bert_fused_integration():
    """BertModel(attention_impl='fused'):

    * deterministic passes match 'auto' EXACTLY — on TPU both select the
      p=0 'fused_det' kernel, off-TPU (this CPU test) both fall back to
      naive (_select_impl's on_tpu parameter; the on-chip fused_det parity
      run lives in scripts/check_fused_det.py);
    * training passes run the kernel (CPU bits path), are finite, differ
      from deterministic, and grads flow finite through the custom_vjp.
    """
    from aspire_tpu.models.bert import BertConfig, BertModel
    cfg = BertConfig.tiny()
    rng = np.random.default_rng(0)
    tok = jnp.asarray(rng.integers(5, 64, (2, 64)).astype(np.int32))
    mask = jnp.asarray((np.arange(64)[None, :] < np.array([[64], [50]]))
                       .astype(np.int32))
    fused = BertModel(cfg, attention_impl="fused")
    auto = BertModel(cfg, attention_impl="auto")
    params = fused.init(jax.random.key(0), tok, mask)["params"]

    det_f, _ = fused.apply({"params": params}, tok, mask, deterministic=True)
    det_a, _ = auto.apply({"params": params}, tok, mask, deterministic=True)
    np.testing.assert_array_equal(np.asarray(det_f), np.asarray(det_a))

    tr, _ = fused.apply({"params": params}, tok, mask, deterministic=False,
                        rngs={"dropout": jax.random.key(1)})
    assert np.isfinite(np.asarray(tr)).all()
    assert not np.allclose(np.asarray(tr), np.asarray(det_f), atol=1e-6)
    # same rng -> same output; different rng -> different mask
    tr2, _ = fused.apply({"params": params}, tok, mask, deterministic=False,
                         rngs={"dropout": jax.random.key(1)})
    np.testing.assert_array_equal(np.asarray(tr), np.asarray(tr2))
    tr3, _ = fused.apply({"params": params}, tok, mask, deterministic=False,
                         rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(tr), np.asarray(tr3), atol=1e-6)

    def loss(p):
        out, _ = fused.apply({"params": p}, tok, mask, deterministic=False,
                             rngs={"dropout": jax.random.key(1)})
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))
