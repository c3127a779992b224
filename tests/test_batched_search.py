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
