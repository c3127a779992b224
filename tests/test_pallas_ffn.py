"""Fused FFN kernel (ops/pallas_ffn.py) CI: interpret mode vs the naive
XLA dense-gelu-dense composition, values AND all five gradients, plus the
BertLayer integration (param-tree interchangeability with nn.Dense)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aspire_tpu.ops.pallas_ffn import fused_ffn, _erf, _gelu_and_grad


def _naive(x, w1, b1, w2, b2):
    inter = jax.nn.gelu(x @ w1 + b1, approximate=False)
    return inter @ w2 + b2


def _rand(rng, rows, h, f, dt):
    mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.1, dt)
    return (jnp.asarray(rng.normal(size=(rows, h)), dt),
            mk(h, f), mk(f), mk(f, h), mk(h))


def test_erf_poly_accuracy():
    """Abramowitz-Stegun 7.1.26 must stay within its 1.5e-7 bound on the
    activation range (Mosaic has no erf primitive)."""
    import scipy.special
    x = np.linspace(-6, 6, 20001).astype(np.float32)
    got = np.asarray(_erf(jnp.asarray(x)))      # f32, as in the kernel
    # 1.5e-7 approximation bound + f32 evaluation rounding
    assert np.abs(got - scipy.special.erf(x.astype(np.float64))).max() < 6e-7


def test_gelu_grad_matches_autodiff(rng):
    x = jnp.asarray(rng.normal(size=(64,)) * 3, jnp.float32)
    _, dg = _gelu_and_grad(x)
    want = jax.vmap(jax.grad(
        lambda v: jax.nn.gelu(v, approximate=False)))(x)
    np.testing.assert_allclose(np.asarray(dg), np.asarray(want),
                               atol=2e-6, rtol=1e-5)


@pytest.mark.parametrize("rows,h,f,dt", [
    (40, 32, 128, jnp.float32),      # multi-block f32
    (512, 64, 256, jnp.float32),
    (33, 32, 128, jnp.bfloat16),     # odd rows -> pad path, bf16
    (7, 16, 64, jnp.float32),        # tiny single padded block
])
def test_fused_ffn_matches_naive(rng, rows, h, f, dt):
    x, w1, b1, w2, b2 = _rand(rng, rows, h, f, dt)
    got = fused_ffn(x, w1, b1, w2, b2, interpret=True)
    want = _naive(x, w1, b1, w2, b2)
    tol = 1e-5 if dt == jnp.float32 else 5e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=tol, rtol=tol)

    def loss(fn):
        return lambda *a: jnp.sum(jnp.tanh(fn(*a).astype(jnp.float32)))

    gf = jax.grad(loss(lambda *a: fused_ffn(*a, interpret=True)),
                  argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gn = jax.grad(loss(_naive), argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b, nm in zip(gf, gn, ["x", "w1", "b1", "w2", "b2"]):
        assert a.dtype == b.dtype, nm
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=tol * 5, rtol=tol * 5, err_msg=nm)


def test_bert_layer_fused_ffn_integration(rng):
    """BertModel(ffn_impl='fused'): identical param TREE to the naive
    nn.Dense layers (checkpoints interchangeable), outputs match naive
    within f32 tolerance, grads finite through the custom_vjp."""
    from aspire_tpu.models.bert import BertConfig, BertModel
    cfg = BertConfig.tiny()
    ids = jnp.asarray(rng.integers(5, 128, (2, 16)).astype(np.int32))
    mask = jnp.ones((2, 16), jnp.int32)
    naive = BertModel(cfg, ffn_impl="naive")
    fused = BertModel(cfg, ffn_impl="fused")
    p_naive = naive.init(jax.random.key(0), ids, mask)["params"]
    p_fused = fused.init(jax.random.key(0), ids, mask)["params"]
    # identical tree AND identical init values (same names -> same RNG path)
    jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        p_naive, p_fused))
    out_n, _ = naive.apply({"params": p_naive}, ids, mask)
    out_f, _ = fused.apply({"params": p_naive}, ids, mask)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_n),
                               atol=2e-5, rtol=1e-4)

    def loss(p):
        out, _ = fused.apply({"params": p}, ids, mask)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(p_fused)
    assert all(bool(jnp.isfinite(x).all())
               for x in jax.tree_util.tree_leaves(g))
    # 'auto' off-TPU stays naive (exact bit parity on the CPU CI backend)
    from aspire_tpu.models.bert import _select_ffn
    assert _select_ffn("auto", on_tpu=False) == "naive"
    assert _select_ffn("auto", on_tpu=True) == "fused"
    assert _select_ffn("naive", on_tpu=True) == "naive"
    assert _select_ffn("fused", on_tpu=False) == "fused"
