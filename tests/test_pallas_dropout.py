"""Hardware-PRNG elementwise dropout kernel (ops/pallas_dropout.py).

CPU CI drives the kernel in interpret mode through the explicit `rng_bits`
operand (the TPU interpreter stubs the hardware PRNG to zeros); the
in-kernel PRNG fast path differs ONLY in where the bits come from and is
validated on chip (RESULTS_r4).  Against the pure-jnp oracle with the SAME
bits, forward and custom_vjp backward must agree exactly (the op is a
masked scale — no accumulation, no rounding divergence at f32).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from aspire_tpu.ops.pallas_dropout import (
    hw_dropout, dropout_reference, _keep_threshold, _block_rows)

P = 0.1


def _inputs(shape, dtype, seed=0):
    ks = jax.random.split(jax.random.key(seed), 2)
    x = jax.random.normal(ks[0], shape, dtype)
    bits = jax.random.bits(ks[1], shape, jnp.uint32)
    return x, bits


def _run(x, bits, p=P):
    return hw_dropout(x, jnp.zeros((1,), jnp.int32), dropout_p=p,
                      rng_bits=bits, interpret=True)


@pytest.mark.parametrize("shape", [(6, 64, 32), (16, 128), (3, 40)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_reference(shape, dtype):
    x, bits = _inputs(shape, dtype)
    keep = bits >= jnp.uint32(_keep_threshold(P))
    got = _run(x, bits)
    want = dropout_reference(x, keep, P)
    assert got.dtype == dtype
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))
    # the mask actually bites
    assert np.count_nonzero(np.asarray(got) == 0) > 0


def test_grads_match_reference_autodiff():
    x, bits = _inputs((4, 96, 64), jnp.float32)
    keep = bits >= jnp.uint32(_keep_threshold(P))
    w = jax.random.normal(jax.random.key(9), x.shape, jnp.float32)

    got = jax.grad(lambda a: jnp.sum(_run(a, bits) * w))(x)
    want = jax.grad(lambda a: jnp.sum(dropout_reference(a, keep, P) * w))(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_p_zero_is_identity():
    x, bits = _inputs((8, 32), jnp.float32)
    np.testing.assert_array_equal(np.asarray(_run(x, bits, p=0.0)),
                                  np.asarray(x))


def test_keep_rate_and_scale():
    x = jnp.ones((64, 512), jnp.float32)
    _, bits = _inputs(x.shape, jnp.float32, seed=3)
    out = np.asarray(_run(x, bits, p=0.25))
    kept = out != 0
    assert abs(kept.mean() - 0.75) < 0.01
    np.testing.assert_allclose(out[kept], 1.0 / 0.75, rtol=1e-6)


def test_block_rows_legal():
    # divisor found under the VMEM cap, sublane-legal
    assert _block_rows(3072, jnp.float32, 768) % 8 == 0
    assert 3072 % _block_rows(3072, jnp.float32, 768) == 0
    assert _block_rows(3072, jnp.bfloat16, 768) % 16 == 0
    # whole-block fallback only when it FITS the VMEM budget (37*128 f32
    # doubles to ~38 KB); hw_dropout pads rows to a sublane multiple so the
    # fallback never fires on large unaligned shapes
    assert _block_rows(37, jnp.float32, 128) == 37
    # padded rows always find a small sublane-legal divisor under the cap
    br = _block_rows(3008, jnp.bfloat16, 768)
    assert br % 16 == 0 and 3008 % br == 0 and br < 3008
    # a VMEM-busting unaligned block asserts loudly instead of compiling
    with pytest.raises(AssertionError):
        _block_rows(3000, jnp.bfloat16, 768)


def test_unaligned_rows_padded():
    """Odd row counts route through the pad-to-sublane path and still match
    the oracle exactly on the real rows."""
    x = jnp.asarray(np.random.default_rng(5).normal(size=(13, 64)),
                    jnp.float32)     # 13 rows: no sublane divisor, pads to 16
    _, bits = _inputs(x.shape, jnp.float32, seed=2)
    got = np.asarray(_run(x, bits))
    keep = np.asarray(bits) >= np.uint32(_keep_threshold(P))
    want = np.asarray(dropout_reference(x, jnp.asarray(keep), P))
    np.testing.assert_array_equal(got, want)


def test_nn_dropout_distribution_equivalence():
    """Same keep-probability semantics as flax nn.Dropout (different bit
    stream): empirical keep rate and the scale factor match."""
    x = jnp.ones((128, 256), jnp.float32)
    ref = nn.Dropout(P, deterministic=False).apply(
        {}, x, rngs={"dropout": jax.random.key(0)})
    _, bits = _inputs(x.shape, jnp.float32, seed=1)
    got = np.asarray(_run(x, bits))
    r = np.asarray(ref)
    assert abs((got != 0).mean() - (r != 0).mean()) < 0.02
    np.testing.assert_allclose(np.unique(got[got != 0]),
                               np.unique(r[r != 0]), rtol=1e-6)


def test_bert_fused_hidden_dropout_trains_cpu():
    """BertModel with hidden_dropout_impl='fused' runs fwd+bwd on CPU
    (interpret mode) and differs from a deterministic pass."""
    from aspire_tpu.models.bert import BertConfig, BertModel
    cfg = BertConfig.tiny()
    m = BertModel(cfg, hidden_dropout_impl="fused")
    ids = jnp.ones((2, 16), jnp.int32)
    mask = jnp.ones_like(ids)
    params = m.init(jax.random.key(0), ids, mask)["params"]

    def fwd(p, det):
        last, _ = m.apply({"params": p}, ids, mask, deterministic=det,
                          rngs={} if det else {"dropout": jax.random.key(1)})
        return last

    w = jax.random.normal(jax.random.key(2), (2, 16, cfg.hidden_size))
    val, grads = jax.value_and_grad(
        lambda p: jnp.sum(fwd(p, False) * w))(params)
    assert np.isfinite(float(val))
    leaf = jax.tree_util.tree_leaves(grads)[0]
    assert np.all(np.isfinite(np.asarray(leaf)))
    # dropout actually perturbs the hidden states vs the eval pass
    diff = np.abs(np.asarray(fwd(params, False) - fwd(params, True)))
    assert diff.max() > 1e-3
