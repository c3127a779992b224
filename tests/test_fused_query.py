"""Fused one-dispatch query path (search + device gather + OT rerank).

Parity oracle: the staged path -- make_dense_search, host
DenseBucketIndex.gather_doc_reps, ot_rerank -- which itself mirrors the
reference's three host-mediated stages (pp_gen_nearest.py:207-363,
729-985).  The fused program must reproduce it bit-for-bit in ids and to
float tolerance in scores, on f32 and int8 storage, single device and
sharded over the full virtual mesh, single-query and batched.
"""
import numpy as np
import jax
import jax.numpy as jnp

from aspire_tpu.core.types import MultiVec
from aspire_tpu.index.dense import (
    build_dense_index, make_dense_search, flatten_device_buckets,
)
from aspire_tpu.index.serve import (
    ot_rerank, make_fused_query, make_fused_query_batched,
)

DIM = 16
MS = 10  # max_sents for rerank


def _mk_index(rng, n_docs, dtype, n_shards=1):
    reps = [rng.normal(size=(int(rng.integers(1, 10)), DIM))
            .astype(np.float32) for _ in range(n_docs)]
    return build_dense_index(reps, [f"p{i}" for i in range(n_docs)],
                             dtype=dtype, n_shards=n_shards)


def _staged(idx, flat, q, q_len, k, solver="xla"):
    """Reference staged pipeline: search -> host gather -> rerank."""
    search = make_dense_search(len(idx.buckets), k=k, int8=idx.is_int8)
    v, d = search(jnp.asarray(q), jnp.int32(q_len), *flat)
    d_np = np.asarray(d)
    cands = idx.gather_doc_reps(d_np, max_sents=MS)
    qmv = MultiVec(embed=jnp.asarray(q)[None], lens=jnp.asarray([q_len]))
    sims = ot_rerank(qmv, cands, temp=5.0, solver=solver)
    return np.asarray(v), d_np, np.asarray(sims)


def test_fused_matches_staged(rng):
    import ml_dtypes
    for dtype in (np.float32, "int8", ml_dtypes.bfloat16):
        idx = _mk_index(rng, 40, dtype)
        flat = flatten_device_buckets(idx.device_arrays())
        pos = idx.device_pos_arrays()
        q = rng.normal(size=(8, DIM)).astype(np.float32)
        q_len = 5
        q[q_len:] = 0
        fused = make_fused_query(len(idx.buckets), k=7, max_sents=MS,
                                 int8=idx.is_int8, temp=5.0)
        v_f, d_f, s_f = fused(jnp.asarray(q), jnp.int32(q_len), *flat, *pos)
        v_s, d_s, s_s = _staged(idx, flat, q, q_len, k=7)
        np.testing.assert_array_equal(np.asarray(d_f), d_s)
        np.testing.assert_allclose(np.asarray(v_f), v_s, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s_f), s_s, rtol=2e-5,
                                   atol=2e-5)


def test_fused_pads_when_pool_smaller_than_k(rng):
    idx = _mk_index(rng, 5, np.float32)
    flat = flatten_device_buckets(idx.device_arrays())
    pos = idx.device_pos_arrays()
    q = rng.normal(size=(8, DIM)).astype(np.float32)
    fused = make_fused_query(len(idx.buckets), k=5, max_sents=MS, temp=5.0)
    v, d, s = fused(jnp.asarray(q), jnp.int32(8), *flat, *pos)
    d = np.asarray(d)
    real = d >= 0
    assert real.sum() == 5
    assert (np.asarray(s)[~real] < -1e29).all()


def test_fused_batched_matches_single(rng):
    for dtype in (np.float32, "int8"):
        idx = _mk_index(rng, 40, dtype)
        flat = flatten_device_buckets(idx.device_arrays())
        pos = idx.device_pos_arrays()
        B, qmax = 3, 8
        q = rng.normal(size=(B, qmax, DIM)).astype(np.float32)
        q_lens = rng.integers(1, qmax + 1, B).astype(np.int32)
        for i in range(B):
            q[i, q_lens[i]:] = 0
        nb = len(idx.buckets)
        fused1 = make_fused_query(nb, k=6, max_sents=MS, int8=idx.is_int8,
                                  temp=5.0)
        fusedB = make_fused_query_batched(nb, k=6, max_sents=MS,
                                          int8=idx.is_int8, temp=5.0)
        vB, dB, sB = fusedB(jnp.asarray(q), jnp.asarray(q_lens), *flat, *pos)
        for i in range(B):
            v1, d1, s1 = fused1(jnp.asarray(q[i]), jnp.int32(int(q_lens[i])),
                                *flat, *pos)
            np.testing.assert_array_equal(np.asarray(dB)[i], np.asarray(d1))
            np.testing.assert_allclose(np.asarray(vB)[i], np.asarray(v1),
                                       atol=1e-5)
            np.testing.assert_allclose(np.asarray(sB)[i], np.asarray(s1),
                                       rtol=2e-5, atol=2e-5)


def test_fused_sharded_matches_single_device(rng):
    from aspire_tpu.parallel.mesh import make_serving_mesh

    n_shards = len(jax.devices())
    mesh = make_serving_mesh(n_shards=n_shards)
    for dtype in (np.float32, "int8"):
        idx = _mk_index(rng, 64, dtype, n_shards=n_shards)
        nb = len(idx.buckets)
        flat1 = flatten_device_buckets(idx.device_arrays())
        pos1 = idx.device_pos_arrays()
        flatN = flatten_device_buckets(idx.device_arrays(mesh))
        posN = idx.device_pos_arrays(mesh)
        q = rng.normal(size=(8, DIM)).astype(np.float32)
        f1 = make_fused_query(nb, k=6, max_sents=MS, int8=idx.is_int8,
                              temp=5.0)
        fN = make_fused_query(nb, k=6, max_sents=MS, int8=idx.is_int8,
                              mesh=mesh, temp=5.0)
        v1, d1, s1 = f1(jnp.asarray(q), jnp.int32(8), *flat1, *pos1)
        vN, dN, sN = fN(jnp.asarray(q), jnp.int32(8), *flatN, *posN)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(dN))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(vN), atol=1e-5)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(sN),
                                   rtol=2e-5, atol=2e-5)


def test_fused_batched_sharded_matches_single_device(rng):
    from aspire_tpu.parallel.mesh import make_serving_mesh

    n_shards = len(jax.devices())
    mesh = make_serving_mesh(n_shards=n_shards)
    idx = _mk_index(rng, 64, "int8", n_shards=n_shards)
    nb = len(idx.buckets)
    flat1 = flatten_device_buckets(idx.device_arrays())
    pos1 = idx.device_pos_arrays()
    flatN = flatten_device_buckets(idx.device_arrays(mesh))
    posN = idx.device_pos_arrays(mesh)
    B, qmax = 4, 8
    q = rng.normal(size=(B, qmax, DIM)).astype(np.float32)
    q_lens = np.full((B,), qmax, np.int32)
    f1 = make_fused_query_batched(nb, k=6, max_sents=MS, int8=True, temp=5.0)
    fN = make_fused_query_batched(nb, k=6, max_sents=MS, int8=True,
                                  mesh=mesh, q_chunk=2, temp=5.0)
    v1, d1, s1 = f1(jnp.asarray(q), jnp.asarray(q_lens), *flat1, *pos1)
    vN, dN, sN = fN(jnp.asarray(q), jnp.asarray(q_lens), *flatN, *posN)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(dN))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(vN), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(sN), rtol=2e-5,
                               atol=2e-5)
