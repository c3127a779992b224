"""On-chip validation of the fused FFN forward kernel (ops/pallas_ffn.py).

CPU CI can only interpret the kernel; this script runs it on the real chip:
  1. kernel forward parity vs the naive XLA dense-gelu-dense composition
     at the train shape (f32 tight, bf16 at bf16 tolerance);
  2. BertModel(ffn_impl='auto') deterministic encode vs ffn_impl='naive'
     on the same params -- the path every serving/eval forward takes;
  3. grads through the custom_vjp (the under-grad path is pure XLA but the
     vjp wiring itself is exercised end to end) finite + close to naive.

Run: python scripts/check_fused_ffn.py
"""
import pathlib
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from aspire_tpu.models.bert import BertConfig, BertModel
from aspire_tpu.ops.pallas_ffn import fused_ffn


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    from aspire_tpu.train.trainer import enable_compilation_cache
    enable_compilation_cache()
    rows, h, f = 4096, 768, 3072
    ks = jax.random.split(jax.random.key(0), 5)

    def naive(x, w1, b1, w2, b2):
        inter = jax.nn.gelu(x @ w1 + b1, approximate=False)
        return inter @ w2 + b2

    for dtype, tol in ((jnp.float32, 3e-5), (jnp.bfloat16, 3e-2)):
        x = jax.random.normal(ks[0], (rows, h), dtype)
        w1 = jax.random.normal(ks[1], (h, f), dtype) * 0.03
        b1 = jax.random.normal(ks[2], (f,), dtype) * 0.03
        w2 = jax.random.normal(ks[3], (f, h), dtype) * 0.03
        b2 = jax.random.normal(ks[4], (h,), dtype) * 0.03
        got = np.asarray(jax.jit(fused_ffn)(x, w1, b1, w2, b2), np.float32)
        want = np.asarray(jax.jit(naive)(x, w1, b1, w2, b2), np.float32)
        assert np.isfinite(got).all()
        err = np.abs(got - want).max() / max(1e-9, np.abs(want).max())
        assert err < tol, (err, dtype)
        print(f"kernel fwd parity {np.dtype(dtype).name}: rel {err:.2e}",
              flush=True)

        def loss(fn, *a):
            return jnp.sum(jnp.tanh(fn(*a).astype(jnp.float32)))

        gf = jax.jit(jax.grad(lambda *a: loss(fused_ffn, *a),
                              argnums=(0, 1, 2, 3, 4)))(x, w1, b1, w2, b2)
        gn = jax.jit(jax.grad(lambda *a: loss(naive, *a),
                              argnums=(0, 1, 2, 3, 4)))(x, w1, b1, w2, b2)
        for a, b, nm in zip(gf, gn, ["x", "w1", "b1", "w2", "b2"]):
            a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
            assert np.isfinite(a).all(), nm
            rel = np.abs(a - b).max() / max(1e-9, np.abs(b).max())
            assert rel < max(tol * 10, 1e-3), (nm, rel, dtype)
        print(f"custom_vjp grads parity {np.dtype(dtype).name} ok",
              flush=True)

    # end-to-end: deterministic BertModel encode, auto (kernel) vs naive
    cfg = BertConfig()  # full BERT-base
    ids = jax.random.randint(jax.random.key(9), (4, 256), 0, cfg.vocab_size)
    mask = jnp.ones((4, 256), jnp.int32)
    m_naive = BertModel(cfg, dtype=jnp.bfloat16, ffn_impl="naive")
    m_auto = BertModel(cfg, dtype=jnp.bfloat16)  # ffn auto -> kernel on TPU
    params = m_naive.init(jax.random.key(10), ids, mask,
                          deterministic=True)
    out_n = np.asarray(jax.jit(lambda p: m_naive.apply(
        p, ids, mask, deterministic=True)[0])(params))
    out_a = np.asarray(jax.jit(lambda p: m_auto.apply(
        p, ids, mask, deterministic=True)[0])(params))
    assert np.isfinite(out_a).all()
    rel = np.abs(out_a - out_n).max() / max(1e-9, np.abs(out_n).max())
    # 12 layers of bf16 accumulation-order differences + LN renormalization
    assert rel < 0.05, rel
    print(f"BertModel auto-vs-naive deterministic encode: rel {rel:.2e}",
          flush=True)
    print("CHECK-FUSED-FFN: ALL OK", flush=True)


if __name__ == "__main__":
    main()
