"""ClsIndex (whole-abstract bi-encoder corpus) build/persist/search.

Mirrors the reference's CLS ranking semantics (pp_gen_nearest.py:638-726):
-L2 between one query vector and one vector per doc.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aspire_tpu.index.cls import (ClsIndex, build_cls_index,
                                  make_cls_search_batched)
from aspire_tpu.parallel.mesh import make_serving_mesh


def _oracle_topk(q, reps, k):
    d = -np.linalg.norm(reps[None] - q[:, None], axis=-1)   # [B, n]
    idx = np.argsort(-d, axis=1)[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


def test_cls_index_roundtrip_and_search(rng, tmp_path):
    n, dim, k = 37, 16, 5
    reps = rng.normal(size=(n, dim)).astype(np.float32)
    pids = [int(100 + i) for i in range(n)]
    idx = build_cls_index(reps, pids, dtype=np.float32)
    idx.save(tmp_path / "ci")
    idx2 = ClsIndex.load(tmp_path / "ci")
    assert idx2.pids == pids and all(isinstance(p, int) for p in idx2.pids)
    np.testing.assert_array_equal(idx2.reps, idx.reps)

    q = rng.normal(size=(3, dim)).astype(np.float32)
    dreps, dnorms = idx2.device_arrays()
    search = make_cls_search_batched(k=k)
    v, i = search(jnp.asarray(q), dreps, dnorms)
    v, i = np.asarray(v), np.asarray(i)
    ov, oi = _oracle_topk(q, reps, k)
    np.testing.assert_array_equal(i, oi)
    np.testing.assert_allclose(v, ov, rtol=1e-5, atol=1e-5)


def test_cls_index_bf16_storage(rng, tmp_path):
    import ml_dtypes
    reps = rng.normal(size=(10, 16)).astype(np.float32)
    idx = build_cls_index(reps, pids=list(range(10)), dtype=ml_dtypes.bfloat16)
    idx.save(tmp_path / "cb")
    idx2 = ClsIndex.load(tmp_path / "cb")
    assert idx2.reps.dtype == ml_dtypes.bfloat16
    q = reps[:2]    # exact self-match must still rank itself first
    search = make_cls_search_batched(k=3)
    _, i = search(jnp.asarray(q), *idx2.device_arrays())
    assert np.asarray(i)[:, 0].tolist() == [0, 1]


def test_cls_sharded_batched_matches_single(rng):
    n, dim, k = 60, 16, 7
    reps = rng.normal(size=(n, dim)).astype(np.float32)
    pids = [f"p{i}" for i in range(n)]
    q = rng.normal(size=(4, dim)).astype(np.float32)

    idx1 = build_cls_index(reps, pids, dtype=np.float32)
    v1, i1 = make_cls_search_batched(k=k)(jnp.asarray(q),
                                          *idx1.device_arrays())
    mesh = make_serving_mesh(n_shards=8)
    v8, i8 = make_cls_search_batched(k=k, mesh=mesh)(
        jnp.asarray(q), *idx1.device_arrays(mesh))
    # ONE index serves any shard count (rows pad to a 128-multiple); row =
    # global doc index, so results agree exactly across layouts
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i8))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v8),
                               rtol=1e-5, atol=1e-6)


def test_cls_batched_pad_sentinel(rng):
    reps = rng.normal(size=(4, 16)).astype(np.float32)
    idx = build_cls_index(reps, pids=list("abcd"), dtype=np.float32)
    q = rng.normal(size=(2, 16)).astype(np.float32)
    _, i = make_cls_search_batched(k=10)(jnp.asarray(q),
                                         *idx.device_arrays())
    i = np.asarray(i)
    assert (i[:, 4:] == -1).all()
    for row in i[:, :4]:
        assert sorted(row.tolist()) == [0, 1, 2, 3]


def test_cls_k_exceeds_shard_rows(rng):
    """k larger than the per-shard row block (and than the whole corpus):
    used to crash in lax.top_k ('k must be no larger than size along axis');
    _topk_padded fills with -1 instead, matching the advertised 'k > n_docs
    never surfaces duplicates' contract on every layout."""
    n, dim, k = 5, 16, 100   # pads to 128 rows -> 16 rows/shard on 8 shards
    reps = rng.normal(size=(n, dim)).astype(np.float32)
    idx = build_cls_index(reps, pids=list(range(n)), dtype=np.float32)
    q = rng.normal(size=(3, dim)).astype(np.float32)

    v1, i1 = make_cls_search_batched(k=k)(jnp.asarray(q),
                                          *idx.device_arrays())
    mesh = make_serving_mesh(n_shards=8)
    v8, i8 = make_cls_search_batched(k=k, mesh=mesh)(
        jnp.asarray(q), *idx.device_arrays(mesh))
    i1, i8 = np.asarray(i1), np.asarray(i8)
    np.testing.assert_array_equal(i1, i8)
    assert (i1[:, n:] == -1).all()
    for row in i1[:, :n]:
        assert sorted(row.tolist()) == list(range(n))


def test_cls_q_chunk_matches_unchunked(rng):
    n, dim, k = 40, 16, 6
    reps = rng.normal(size=(n, dim)).astype(np.float32)
    idx = build_cls_index(reps, pids=list(range(n)), dtype=np.float32)
    q = rng.normal(size=(8, dim)).astype(np.float32)
    dev = idx.device_arrays()
    v, i = make_cls_search_batched(k=k)(jnp.asarray(q), *dev)
    vc, ic = make_cls_search_batched(k=k, q_chunk=2)(jnp.asarray(q), *dev)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ic))
    np.testing.assert_allclose(np.asarray(v), np.asarray(vc), rtol=1e-6)
    mesh = make_serving_mesh(n_shards=8)
    vs, is_ = make_cls_search_batched(k=k, mesh=mesh, q_chunk=4)(
        jnp.asarray(q), *idx.device_arrays(mesh))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(is_))


def test_exact_precision_reaches_hlo(rng):
    """The MXU rounds f32 inputs to bf16 at DEFAULT precision, which flips
    near-tie neighbours on paths whose scan IS the final ranking (measured
    on v5e: CLS f32 index 3/96 flipped slots vs an f64 oracle; sent/cosine
    f32 dense index 2/40, both 0 at HIGHEST).  CPU math is exact either
    way, so assert the precision attribute lands in the lowered program:
    CLS always, dense iff exact=True."""
    from aspire_tpu.index.dense import (build_dense_index,
                                        make_dense_search_batched,
                                        flatten_device_buckets)
    n, dim = 12, 16
    reps = rng.normal(size=(n, dim)).astype(np.float32)
    idx = build_cls_index(reps, pids=list(range(n)), dtype=np.float32)
    q = jnp.asarray(rng.normal(size=(2, dim)).astype(np.float32))
    txt = make_cls_search_batched(k=4).lower(q, *idx.device_arrays()).as_text()
    assert "HIGHEST" in txt

    docs = [rng.normal(size=(3, dim)).astype(np.float32) for _ in range(n)]
    didx = build_dense_index(docs, list(range(n)), dtype=np.float32,
                             score_type="cosine")
    flat = flatten_device_buckets(didx.device_arrays())
    qd = jnp.asarray(rng.normal(size=(2, 4, dim)).astype(np.float32))
    qls = jnp.asarray(np.full((2,), 4, np.int32))
    for exact in (False, True):
        s = make_dense_search_batched(1, k=4, exact=exact)
        txt = s.lower(qd, qls, *flat).as_text()
        assert ("HIGHEST" in txt) == exact
