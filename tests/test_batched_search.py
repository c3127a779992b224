"""Batched multi-query dense search parity."""
import numpy as np
import jax.numpy as jnp

from aspire_tpu.index.dense import (
    build_dense_index, make_dense_search, make_dense_search_batched,
    flatten_device_buckets,
)


def test_batched_matches_single(rng):
    reps = [rng.normal(size=(int(rng.integers(1, 10)), 16)).astype(np.float32)
            for _ in range(50)]
    idx = build_dense_index(reps, [f"p{i}" for i in range(50)], dtype=np.float32)
    dev = idx.device_arrays()
    flat = flatten_device_buckets(dev)
    single = make_dense_search(len(dev), k=8)
    batched = make_dense_search_batched(len(dev), k=8)
    B, qmax = 4, 8
    q = rng.normal(size=(B, qmax, 16)).astype(np.float32)
    q_lens = rng.integers(1, qmax + 1, B).astype(np.int32)
    for i in range(B):
        q[i, q_lens[i]:] = 0
    vb, db = batched(jnp.asarray(q), jnp.asarray(q_lens), *flat)
    for i in range(B):
        vs, dsingle = single(jnp.asarray(q[i]), jnp.int32(int(q_lens[i])), *flat)
        np.testing.assert_array_equal(np.asarray(db)[i], np.asarray(dsingle))
        np.testing.assert_allclose(np.asarray(vb)[i], np.asarray(vs),
                                   rtol=1e-5, atol=1e-5)


def _mk_query_batch(rng, B, qmax, dim):
    q = rng.normal(size=(B, qmax, dim)).astype(np.float32)
    q_lens = rng.integers(1, qmax + 1, B).astype(np.int32)
    for i in range(B):
        q[i, q_lens[i]:] = 0
    return q, q_lens


def test_batched_chunked_matches_unchunked(rng):
    reps = [rng.normal(size=(int(rng.integers(1, 10)), 16)).astype(np.float32)
            for _ in range(60)]
    idx = build_dense_index(reps, [f"p{i}" for i in range(60)], dtype=np.float32)
    flat = flatten_device_buckets(idx.device_arrays())
    nb = len(idx.buckets)
    q, q_lens = _mk_query_batch(rng, 8, 6, 16)
    v0, d0 = make_dense_search_batched(nb, k=7)(
        jnp.asarray(q), jnp.asarray(q_lens), *flat)
    v1, d1 = make_dense_search_batched(nb, k=7, q_chunk=2)(
        jnp.asarray(q), jnp.asarray(q_lens), *flat)
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-6)


def test_batched_sharded_matches_single_device(rng):
    """Multi-chip batched serving: per-shard top-k + all_gather merge must
    reproduce the single-device batched results exactly."""
    import jax
    from aspire_tpu.parallel.mesh import make_serving_mesh

    n_shards = len(jax.devices())
    mesh = make_serving_mesh(n_shards=n_shards)
    reps = [rng.normal(size=(int(rng.integers(1, 10)), 16)).astype(np.float32)
            for _ in range(80)]
    pids = [f"p{i}" for i in range(80)]
    for dtype in (np.float32, "int8"):
        idx = build_dense_index(reps, pids, n_shards=n_shards, dtype=dtype)
        nb = len(idx.buckets)
        flat1 = flatten_device_buckets(idx.device_arrays())
        flatN = flatten_device_buckets(idx.device_arrays(mesh))
        q, q_lens = _mk_query_batch(rng, 4, 8, 16)
        v0, d0 = make_dense_search_batched(nb, k=6, int8=idx.is_int8)(
            jnp.asarray(q), jnp.asarray(q_lens), *flat1)
        vN, dN = make_dense_search_batched(nb, k=6, int8=idx.is_int8,
                                           mesh=mesh, q_chunk=2)(
            jnp.asarray(q), jnp.asarray(q_lens), *flatN)
        np.testing.assert_array_equal(np.asarray(d0), np.asarray(dN))
        np.testing.assert_allclose(np.asarray(v0), np.asarray(vN), atol=1e-6)
