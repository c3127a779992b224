"""Index build + search tests, incl. the 8-device sharded path and an
oracle comparison against brute-force numpy scoring."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aspire_tpu.core.types import MultiVec
from aspire_tpu.index.build import MultiVecIndex, build_index_from_reps
from aspire_tpu.index.serve import (
    l2max_search, make_sharded_search, gather_doc_reps, ot_rerank, l2max_rerank,
)
from aspire_tpu.parallel.mesh import make_serving_mesh
from oracles import np_cdist


def make_corpus(rng, n_docs=40, d=16):
    reps = [rng.normal(size=(int(rng.integers(1, 8)), d)).astype(np.float32)
            for _ in range(n_docs)]
    pids = [f"p{i}" for i in range(n_docs)]
    return reps, pids


def brute_scores(q, reps):
    """Oracle: per-doc max over -cdist(query sents, doc sents)."""
    return np.array([np.max(-np_cdist(q, r)) for r in reps])


def test_build_and_single_device_search(rng):
    reps, pids = make_corpus(rng)
    idx = build_index_from_reps(reps, pids, n_shards=4)
    assert idx.n_shards == 4 and idx.n_docs == 40
    # every doc's sentences land in exactly one shard contiguously
    for di in range(40):
        shard_hits = [(s, (idx.doc_ids[s] == di).sum()) for s in range(4)]
        nz = [c for _, c in shard_hits if c > 0]
        assert len(nz) == 1 and nz[0] == len(reps[di])

    q = rng.normal(size=(5, 16)).astype(np.float32)
    scores, docs = l2max_search(jnp.asarray(q), jnp.int32(5),
                                jnp.asarray(idx.sents), jnp.asarray(idx.doc_ids),
                                idx.n_docs, 10)
    want = brute_scores(q, reps)
    order = np.argsort(-want)
    np.testing.assert_array_equal(np.asarray(docs), order[:10])
    np.testing.assert_allclose(np.asarray(scores), want[order[:10]], rtol=1e-4, atol=1e-4)


def test_query_len_masking(rng):
    reps, pids = make_corpus(rng, n_docs=10)
    idx = build_index_from_reps(reps, pids, n_shards=1)
    q = rng.normal(size=(6, 16)).astype(np.float32)
    # only first 2 query sentences valid
    s2, d2 = l2max_search(jnp.asarray(q), jnp.int32(2), jnp.asarray(idx.sents),
                          jnp.asarray(idx.doc_ids), idx.n_docs, 5)
    want = brute_scores(q[:2], reps)
    order = np.argsort(-want)
    np.testing.assert_array_equal(np.asarray(d2), order[:5])


def test_sharded_search_matches_single(rng):
    reps, pids = make_corpus(rng, n_docs=64)
    idx = build_index_from_reps(reps, pids, n_shards=8)
    mesh = make_serving_mesh()
    sents, doc_ids = idx.device_arrays(mesh)
    fn = make_sharded_search(mesh, idx.n_docs, 10)
    q = rng.normal(size=(4, 16)).astype(np.float32)
    scores, docs = fn(jnp.asarray(q), jnp.int32(4), sents, doc_ids)
    want = brute_scores(q, reps)
    order = np.argsort(-want)
    np.testing.assert_array_equal(np.asarray(docs), order[:10])
    np.testing.assert_allclose(np.asarray(scores), want[order[:10]], rtol=1e-4, atol=1e-4)


def test_save_load_roundtrip(rng, tmp_path):
    reps, pids = make_corpus(rng, n_docs=12)
    idx = build_index_from_reps(reps, pids, n_shards=2)
    idx.save(tmp_path / "idx")
    idx2 = MultiVecIndex.load(tmp_path / "idx")
    np.testing.assert_array_equal(idx.sents, idx2.sents)
    np.testing.assert_array_equal(idx.doc_ids, idx2.doc_ids)
    assert idx.pids == idx2.pids


def test_gather_and_rerank(rng):
    reps, pids = make_corpus(rng, n_docs=20)
    idx = build_index_from_reps(reps, pids, n_shards=2)
    doc_idx = np.array([3, 7, 11])
    cands = gather_doc_reps(idx, doc_idx, max_sents=8)
    for i, di in enumerate(doc_idx):
        ln = len(reps[di])
        assert int(cands.lens[i]) == ln
        np.testing.assert_allclose(np.asarray(cands.embed)[i, :ln], reps[di], rtol=1e-6)
    # pad ids (-1) must yield zero rows, not the last doc via wraparound
    padded = gather_doc_reps(idx, np.array([3, -1]), max_sents=8)
    assert int(padded.lens[1]) == 0
    assert (np.asarray(padded.embed)[1] == 0).all()

    q = MultiVec(embed=jnp.asarray(rng.normal(size=(1, 5, 16)).astype(np.float32)),
                 lens=jnp.asarray([5], np.int32))
    # l2max rerank matches brute force
    sims = np.asarray(l2max_rerank(q, cands))
    want = brute_scores(np.asarray(q.embed)[0], [reps[d] for d in doc_idx])
    np.testing.assert_allclose(sims, want, rtol=1e-4, atol=1e-4)
    # OT rerank runs and is finite
    ot = np.asarray(ot_rerank(q, cands, temp=5000.0))
    assert np.isfinite(ot).all() and ot.shape == (3,)


def test_bf16_index_ranking_stable(rng):
    # bf16 storage must preserve the top-k ordering for well-separated docs
    reps, pids = make_corpus(rng, n_docs=30)
    idx32 = build_index_from_reps(reps, pids, n_shards=2, dtype=np.float32)
    import ml_dtypes
    idx16 = build_index_from_reps(reps, pids, n_shards=2, dtype=ml_dtypes.bfloat16)
    q = rng.normal(size=(3, 16)).astype(np.float32)
    _, d32 = l2max_search(jnp.asarray(q), jnp.int32(3), jnp.asarray(idx32.sents),
                          jnp.asarray(idx32.doc_ids), 30, 5)
    _, d16 = l2max_search(jnp.asarray(q), jnp.int32(3),
                          jnp.asarray(np.asarray(idx16.sents)),
                          jnp.asarray(idx16.doc_ids), 30, 5)
    # top-1 must agree; deeper ranks may swap under quantization
    assert int(d32[0]) == int(d16[0])


def test_encode_corpus_roundtrip(rng, tmp_path):
    """encode_corpus -> build index -> search finds a planted duplicate."""
    from transformers import BertTokenizer
    import jax
    from aspire_tpu.core.config import ModelHParams
    from aspire_tpu.models.bert import BertConfig
    from aspire_tpu.models.doc_models import build_model
    from aspire_tpu.index.build import encode_corpus
    from aspire_tpu.index.dense import (build_dense_index, make_dense_search,
                                        flatten_device_buckets)
    words = ["alpha", "beta", "gamma", "delta"]
    (tmp_path / "vocab.txt").write_text(
        "\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "title"] + words))
    tok = BertTokenizer(str(tmp_path / "vocab.txt"))
    hp = ModelHParams(model_name="miswordbienc", score_aggregation="l2max",
                      max_sents=4)
    model = build_model(hp, BertConfig.tiny())
    params = model.init_params(jax.random.key(0))
    corpus = [{"TITLE": "title", "ABSTRACT": [
        " ".join(rng.choice(words, 3)) for _ in range(int(rng.integers(1, 4)))]}
        for _ in range(10)]
    reps, cls = encode_corpus(model, params, corpus, tok, batch_size=4,
                              seq_len=32, max_sents=4)
    assert len(reps) == 10 and cls.shape == (10, 32)
    idx = build_dense_index(reps, [f"p{i}" for i in range(10)], dtype=np.float32)
    dev = idx.device_arrays()
    search = make_dense_search(len(dev), k=3)
    # query with doc 7's own reps -> doc 7 must be top-1 with score ~0
    q = np.zeros((8, 32), np.float32)
    q[: len(reps[7])] = reps[7]
    scores, docs = search(jnp.asarray(q), jnp.int32(len(reps[7])),
                          *flatten_device_buckets(dev))
    assert int(docs[0]) == 7
    assert abs(float(scores[0])) < 1e-2


def test_flat_bf16_save_load(rng, tmp_path):
    import ml_dtypes
    reps, pids = make_corpus(rng, n_docs=10)
    idx = build_index_from_reps(reps, pids, n_shards=2, dtype=ml_dtypes.bfloat16)
    idx.save(tmp_path / "fb16")
    idx2 = MultiVecIndex.load(tmp_path / "fb16")
    assert idx2.sents.dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(idx.sents.view(np.uint16),
                                  idx2.sents.view(np.uint16))
    # loaded arrays are jax-convertible and searchable
    s, d = l2max_search(jnp.asarray(rng.normal(size=(3, 16)).astype(np.float32)),
                        jnp.int32(3), jnp.asarray(np.asarray(idx2.sents)),
                        jnp.asarray(idx2.doc_ids), 10, 3)
    assert np.isfinite(np.asarray(s)).all()


def test_sharded_search_rejects_k_over_n_docs(rng):
    """k > n_docs would let NEG-filled shard entries alias real doc ids in
    the gathered merge pool; the builder must refuse loudly."""
    from aspire_tpu.parallel.mesh import make_serving_mesh
    reps = [rng.normal(size=(2, 16)).astype(np.float32) for _ in range(3)]
    idx = build_index_from_reps(reps, list("abc"), n_shards=8)
    mesh = make_serving_mesh(n_shards=8)
    with pytest.raises(ValueError, match="n_docs"):
        make_sharded_search(mesh, idx.n_docs, k=5)


def test_int_pids_survive_save_load_flat(rng, tmp_path):
    reps, _ = make_corpus(rng, n_docs=5)
    idx = build_index_from_reps(reps, pids=[7, 8, 9, 10, 11])
    idx.save(tmp_path / "ipf")
    idx2 = MultiVecIndex.load(tmp_path / "ipf")
    assert idx2.pids == [7, 8, 9, 10, 11]
    assert all(isinstance(p, int) for p in idx2.pids)


def test_shard_packer_never_strands_empty_shards(rng):
    """One oversized doc must not leave empty shards behind it (every shard
    pads to the max fill, so empties inflate memory for all)."""
    reps = [rng.normal(size=(n, 16)).astype(np.float32)
            for n in (10, 1, 1, 1)]
    idx = build_index_from_reps(reps, pids=list("abcd"), n_shards=4)
    # every shard holds at least one real doc
    assert all((idx.doc_ids[s] >= 0).any() for s in range(4))


def test_cls_search_marks_pad_rows(rng):
    """k > n_docs: pad rows (+inf norms) come back as -1, not plausible
    doc indices (the dense-path sentinel contract)."""
    from aspire_tpu.index.cls import pack_cls_index, cls_search
    import jax.numpy as jnp
    cls = rng.normal(size=(5, 16)).astype(np.float32)
    reps, norms = pack_cls_index(cls)
    q = rng.normal(size=(16,)).astype(np.float32)
    v, i = cls_search(jnp.asarray(q), jnp.asarray(reps), jnp.asarray(norms),
                      k=12)
    i = np.asarray(i)
    assert set(i[i >= 0].tolist()) <= set(range(5))
    assert (i[5:] == -1).all()
