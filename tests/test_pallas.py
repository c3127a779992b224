"""Pallas kernel parity tests (interpret mode on CPU; compiled path is
exercised on the real TPU by bench/verify runs)."""
import numpy as np
import jax.numpy as jnp
import pytest

from aspire_tpu.ops.sinkhorn import sinkhorn_potentials
from aspire_tpu.ops.pallas_sinkhorn import sinkhorn_potentials_pallas


def test_pallas_sinkhorn_matches_xla(rng):
    bsz, n, m, d = 5, 7, 11, 16
    x = rng.normal(size=(bsz, n, d)).astype(np.float32)
    y = rng.normal(size=(bsz, m, d)).astype(np.float32)
    a = rng.random((bsz, n)).astype(np.float32) + 0.1
    b = rng.random((bsz, m)).astype(np.float32) + 0.1
    # zero some pad atoms
    a[:, -2:] = 0.0
    b[:, -3:] = 0.0
    a /= a.sum(1, keepdims=True)
    b /= b.sum(1, keepdims=True)

    f_ref, g_ref = sinkhorn_potentials(a, x, b, y)
    f_pl, g_pl = sinkhorn_potentials_pallas(
        jnp.asarray(a), jnp.asarray(x), jnp.asarray(b), jnp.asarray(y),
        interpret=True)
    # compare on atoms with mass
    np.testing.assert_allclose(np.asarray(f_pl)[:, :-2],
                               np.asarray(f_ref)[:, :-2], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g_pl)[:, :-3],
                               np.asarray(g_ref)[:, :-3], rtol=2e-3, atol=2e-3)


def test_pallas_pooling_matches_einsum(rng):
    from aspire_tpu.models.encoders import sentence_pool
    from aspire_tpu.ops.pallas_pool import sentence_pool_pallas
    b, t, h, smax = 3, 32, 128, 6
    hidden = jnp.asarray(rng.normal(size=(b, t, h)).astype(np.float32))
    sent_ids = np.full((b, t), -1, np.int32)
    for i in range(b):
        pos = 2
        for s in range(smax - 1):
            n = int(rng.integers(1, 5))
            sent_ids[i, pos:pos + n] = s
            pos += n
    want = np.asarray(sentence_pool(hidden, jnp.asarray(sent_ids), smax))
    got = np.asarray(sentence_pool_pallas(hidden, jnp.asarray(sent_ids), smax,
                                          interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_wasserstein_solver_pallas_matches_xla(rng):
    """The full scoring path (marginals + solve + plan reconstruction) must
    give the same similarities with either solver (pallas runs in interpret
    mode on CPU)."""
    from aspire_tpu.core.types import MultiVec
    from aspire_tpu.ops.distances import wasserstein_dist
    b, s, d = 4, 6, 16
    q = MultiVec(embed=jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32)),
                 lens=jnp.asarray(rng.integers(1, s + 1, (b,)).astype(np.int32)))
    c = MultiVec(embed=jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32)),
                 lens=jnp.asarray(rng.integers(1, s + 1, (b,)).astype(np.int32)))
    sims_x, (ax, bx, negx, planx, _) = wasserstein_dist(
        q, c, temp=5000.0, return_pair_sims=True, solver="xla")
    sims_p, (ap, bp, negp, planp, _) = wasserstein_dist(
        q, c, temp=5000.0, return_pair_sims=True, solver="pallas")
    np.testing.assert_allclose(np.asarray(sims_p), np.asarray(sims_x),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(planp), np.asarray(planx),
                               rtol=5e-3, atol=5e-3)
    # per-pair diameter mode (the eval path) rides the same per-lane kernel
    pair_x, _ = wasserstein_dist(q, c, temp=5000.0, return_pair_sims=True,
                                 diameter="pair", solver="xla")
    pair_p, _ = wasserstein_dist(q, c, temp=5000.0, return_pair_sims=True,
                                 diameter="pair", solver="pallas")
    np.testing.assert_allclose(np.asarray(pair_p), np.asarray(pair_x),
                               rtol=2e-3, atol=2e-3)
    with pytest.raises(ValueError, match="balanced"):
        wasserstein_dist(q, c, temp=5000.0, reach=1.0, solver="pallas")


def test_pallas_pooling_long_sequence_tiles(rng):
    """t=512 exceeds the single-block VMEM budget: the t-tiled accumulation
    path must still match the einsum exactly."""
    from aspire_tpu.models.encoders import sentence_pool
    from aspire_tpu.ops.pallas_pool import sentence_pool_pallas, _VMEM_BLOCK_BYTES
    b, t, h, smax = 2, 512, 768, 8
    assert 8 * t * h * 4 > _VMEM_BLOCK_BYTES      # the config that tiles
    hidden = jnp.asarray(rng.normal(size=(b, t, h)).astype(np.float32))
    sent_ids = np.full((b, t), -1, np.int32)
    for i in range(b):
        pos = 2
        for s in range(smax):
            n = int(rng.integers(20, 80))
            sent_ids[i, pos:pos + n] = s
            pos += n
    want = np.asarray(sentence_pool(hidden, jnp.asarray(sent_ids), smax))
    got = np.asarray(sentence_pool_pallas(hidden, jnp.asarray(sent_ids), smax,
                                          interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_l2max_scan_matches_brute(rng):
    """The (unwired, documented-negative-result) fused scan kernel must still
    be correct: per-doc max(2 q.x - |x|^2) vs a numpy brute force."""
    from aspire_tpu.ops.pallas_scan import fused_l2max_scan
    n, s, d, q_n, qpad = 256, 4, 128, 5, 8
    sents = rng.normal(size=(n, s, d)).astype(np.float32)
    # pad some sentence slots: zero rows with +inf norms (excluded via -inf)
    pad = rng.random((n, s)) < 0.3
    sents[pad] = 0.0
    norms = np.einsum("nsd,nsd->ns", sents, sents).astype(np.float32)
    norms[pad] = np.inf
    q = np.zeros((qpad, d), np.float32)
    q[:q_n] = rng.normal(size=(q_n, d)).astype(np.float32)
    got = np.asarray(fused_l2max_scan(jnp.asarray(sents), jnp.asarray(q),
                                      jnp.asarray(norms), q_n=q_n,
                                      block_docs=128, interpret=True))
    sims = np.einsum("nsd,qd->nsq", sents, q[:q_n])
    scores = 2.0 * sims - norms[:, :, None]
    # a doc whose slots are ALL pads scores the kernel's NEG clamp (-1e30),
    # the same sentinel dense-index dummy docs carry
    want = np.maximum(scores.reshape(n, -1).max(axis=1), -1e30)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_int8_batched_scan_kernel_matches_xla_path(rng):
    """fused_l2max_scan_int8_batched == score_buckets_batched per-doc scores
    and top-k ids on an int8 bucket (both paths: int8->bf16 dequant matmul,
    f32 accumulation -- only reduction order differs)."""
    from aspire_tpu.index.dense import (build_dense_index,
                                        score_buckets_batched)
    from aspire_tpu.ops.pallas_scan import fused_l2max_scan_int8_batched

    d, n_docs, B, qmax = 128, 57, 4, 6
    reps = [rng.normal(size=(int(rng.integers(1, 9)), d)).astype(np.float32)
            for _ in range(n_docs)]
    idx = build_dense_index(reps, [f"p{i}" for i in range(n_docs)],
                            buckets=(8,), dtype="int8")
    b0 = idx.buckets[0]
    q = rng.normal(size=(B, qmax, d)).astype(np.float32)
    q_lens = np.array([6, 3, 1, 5], np.int32)

    out = fused_l2max_scan_int8_batched(
        jnp.asarray(b0["sents"]), jnp.asarray(b0["scales"]),
        jnp.asarray(b0["norms"]), jnp.asarray(q), jnp.asarray(q_lens),
        qmax=qmax, interpret=True)                       # [N, B]
    out = np.asarray(out)

    dev = idx.device_arrays()
    v_want, d_want = score_buckets_batched(dev, jnp.asarray(q),
                                           jnp.asarray(q_lens), k=10)
    # kernel emits ALL per-doc scores; reduce to top-k for comparison
    doc_idx = np.asarray(b0["doc_idx"])
    scores_bq = out.T.copy()                             # [B, N]
    scores_bq[:, doc_idx < 0] = -1e30
    order = np.argsort(-scores_bq, axis=1)[:, :10]
    np.testing.assert_array_equal(doc_idx[order], np.asarray(d_want))
    np.testing.assert_allclose(np.take_along_axis(scores_bq, order, axis=1),
                               np.asarray(v_want), rtol=2e-4, atol=2e-4)


def test_int8_batched_scan_kernel_block_helper():
    from aspire_tpu.ops.pallas_scan import _block_docs_int8
    for n, s in ((64, 8), (120, 12), (4096, 24), (40, 20), (8, 16)):
        bd = _block_docs_int8(n, s)
        assert n % bd == 0 and (bd * s) % 32 == 0, (n, s, bd)
