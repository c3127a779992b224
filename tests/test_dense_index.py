"""Dense-bucketed index tests: oracle parity, sharded merge, persistence."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aspire_tpu.index.dense import (
    build_dense_index, make_dense_search, flatten_device_buckets,
    DenseBucketIndex,
)
from aspire_tpu.parallel.mesh import make_serving_mesh
from oracles import np_cdist


def make_corpus(rng, n_docs=60, d=16, max_s=10):
    reps = [rng.normal(size=(int(rng.integers(1, max_s)), d)).astype(np.float32)
            for _ in range(n_docs)]
    return reps, [f"p{i}" for i in range(n_docs)]


def brute(q, reps):
    return np.array([np.max(-np_cdist(q, r)) for r in reps])


def test_dense_search_matches_oracle(rng):
    reps, pids = make_corpus(rng)
    idx = build_dense_index(reps, pids, dtype=np.float32)
    dev = idx.device_arrays()
    search = make_dense_search(len(dev), k=10)
    q = rng.normal(size=(5, 16)).astype(np.float32)
    qpad = np.zeros((8, 16), np.float32)
    qpad[:5] = q
    scores, docs = search(jnp.asarray(qpad), jnp.int32(5),
                          *flatten_device_buckets(dev))
    want = brute(q, reps)
    order = np.argsort(-want)
    np.testing.assert_array_equal(np.asarray(docs), order[:10])
    np.testing.assert_allclose(np.asarray(scores), want[order[:10]],
                               rtol=1e-4, atol=1e-4)


def test_dense_sharded_matches_single(rng):
    reps, pids = make_corpus(rng, n_docs=96)
    idx = build_dense_index(reps, pids, n_shards=8, dtype=np.float32)
    mesh = make_serving_mesh()
    dev = idx.device_arrays(mesh)
    search = make_dense_search(len(dev), k=12, mesh=mesh)
    q = rng.normal(size=(8, 16)).astype(np.float32)
    scores, docs = search(jnp.asarray(q), jnp.int32(8),
                          *flatten_device_buckets(dev))
    want = brute(q, reps)
    order = np.argsort(-want)
    np.testing.assert_array_equal(np.asarray(docs), order[:12])
    np.testing.assert_allclose(np.asarray(scores), want[order[:12]],
                               rtol=1e-4, atol=1e-4)


def test_dense_save_load_and_gather(rng, tmp_path):
    reps, pids = make_corpus(rng, n_docs=20)
    idx = build_dense_index(reps, pids, dtype=np.float32)
    idx.save(tmp_path / "d")
    idx2 = DenseBucketIndex.load(tmp_path / "d")
    assert idx2.pids == idx.pids
    for b1, b2 in zip(idx.buckets, idx2.buckets):
        np.testing.assert_array_equal(b1["sents"], b2["sents"])
    mv = idx2.gather_doc_reps([3, 7], max_sents=12)
    assert int(mv.lens[0]) == len(reps[3])
    np.testing.assert_allclose(np.asarray(mv.embed)[0, :len(reps[3])], reps[3],
                               rtol=1e-6)


def test_truncation_to_largest_bucket(rng):
    reps = [rng.normal(size=(40, 8)).astype(np.float32)]  # > max bucket 24
    idx = build_dense_index(reps, ["p0"], dtype=np.float32)
    assert idx.doc_lens[0] == 24
    assert idx.buckets[-1]["sents"].shape[1] == 24


def test_bf16_save_load_roundtrip(rng, tmp_path):
    import ml_dtypes
    reps, pids = make_corpus(rng, n_docs=12)
    idx = build_dense_index(reps, pids, dtype=ml_dtypes.bfloat16)
    idx.save(tmp_path / "b16")
    idx2 = DenseBucketIndex.load(tmp_path / "b16")
    assert idx2.buckets[0]["sents"].dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(
        idx.buckets[0]["sents"].view(np.uint16),
        idx2.buckets[0]["sents"].view(np.uint16))
    # loaded index is searchable
    import jax.numpy as jnp
    dev = idx2.device_arrays()
    search = make_dense_search(len(dev), k=3)
    qn = min(len(reps[4]), 8)
    q = np.zeros((8, 16), np.float32)
    q[:qn] = reps[4][:qn]
    scores, docs = search(jnp.asarray(q), jnp.int32(qn),
                          *flatten_device_buckets(dev))
    assert int(docs[0]) == 4
