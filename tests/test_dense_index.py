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


def test_gather_doc_reps_pad_ids_are_zero(rng):
    """Pad doc ids (-1, emitted by _topk_padded when the pool < k) must give
    zero rows and len 0 -- numpy's negative indexing would otherwise fetch
    the LAST doc's reps and a phantom candidate could outrank real ones."""
    reps, pids = make_corpus(rng, n_docs=10)
    idx = build_dense_index(reps, pids, dtype=np.float32)
    mv = idx.gather_doc_reps([2, -1, 5, -1], max_sents=12)
    lens = np.asarray(mv.lens)
    emb = np.asarray(mv.embed)
    assert lens[1] == 0 and lens[3] == 0
    assert (emb[1] == 0).all() and (emb[3] == 0).all()
    assert lens[0] == len(reps[2]) and lens[2] == len(reps[5])
    np.testing.assert_allclose(emb[0, : lens[0]], reps[2], rtol=1e-6)


def test_truncation_to_largest_bucket(rng):
    reps = [rng.normal(size=(40, 8)).astype(np.float32)]  # > max bucket 24
    idx = build_dense_index(reps, ["p0"], dtype=np.float32)
    assert idx.doc_lens[0] == 24
    assert idx.buckets[-1]["sents"].shape[1] == 24


def dequantized(idx):
    """Reconstruct per-doc float reps exactly as stored (scale * int8)."""
    out = {}
    for b in idx.buckets:
        for row, di in enumerate(b["doc_idx"]):
            if di < 0:
                continue
            ln = idx.doc_lens[di]
            out[int(di)] = (b["sents"][row, :ln].astype(np.float32)
                            * b["scales"][row, :ln, None])
    return [out[i] for i in range(len(out))]


def test_int8_search_exact_on_stored_values(rng):
    """score must equal the oracle computed on the DEQUANTIZED stored reps
    (quantization moves the vectors; the scoring math itself is exact)."""
    reps, pids = make_corpus(rng)
    idx = build_dense_index(reps, pids, dtype="int8")
    assert idx.is_int8 and idx.buckets[0]["sents"].dtype == np.int8
    dev = idx.device_arrays()
    search = make_dense_search(len(dev), k=10, int8=True)
    q = rng.normal(size=(5, 16)).astype(np.float32)
    qpad = np.zeros((8, 16), np.float32)
    qpad[:5] = q
    scores, docs = search(jnp.asarray(qpad), jnp.int32(5),
                          *flatten_device_buckets(dev))
    want = brute(q, dequantized(idx))
    order = np.argsort(-want)
    np.testing.assert_array_equal(np.asarray(docs), order[:10])
    # bf16 upcast path: matmul rounding ~1e-2 on unnormalized vectors
    np.testing.assert_allclose(np.asarray(scores), want[order[:10]],
                               rtol=2e-2, atol=2e-2)


def test_int8_recall_vs_bf16(rng):
    """top-k recall of the int8 index vs exact f32 scoring on a corpus with
    realistic (768-d, unit-ish norm) embeddings."""
    d = 768
    reps = [np.random.default_rng(i).normal(size=(int(rng.integers(1, 12)), d))
            .astype(np.float32) / np.sqrt(d) for i in range(300)]
    pids = [f"p{i}" for i in range(300)]
    exact = build_dense_index(reps, pids, dtype=np.float32)
    quant = build_dense_index(reps, pids, dtype="int8")
    k = 50
    s_f32 = make_dense_search(len(exact.buckets), k=k)
    s_int8 = make_dense_search(len(quant.buckets), k=k, int8=True)
    hits = total = 0
    for qi in range(4):
        q = np.random.default_rng(1000 + qi).normal(size=(8, d)).astype(np.float32) / np.sqrt(d)
        _, d_f32 = s_f32(jnp.asarray(q), jnp.int32(8),
                         *flatten_device_buckets(exact.device_arrays()))
        _, d_i8 = s_int8(jnp.asarray(q), jnp.int32(8),
                         *flatten_device_buckets(quant.device_arrays()))
        hits += len(set(np.asarray(d_f32).tolist())
                    & set(np.asarray(d_i8).tolist()))
        total += k
    assert hits / total >= 0.96, hits / total


def test_int8_sharded_save_load_gather(rng, tmp_path):
    reps, pids = make_corpus(rng, n_docs=96)
    idx = build_dense_index(reps, pids, n_shards=8, dtype="int8")
    idx.save(tmp_path / "i8")
    idx2 = DenseBucketIndex.load(tmp_path / "i8")
    assert idx2.is_int8
    np.testing.assert_array_equal(idx.buckets[0]["scales"],
                                  idx2.buckets[0]["scales"])
    mesh = make_serving_mesh()
    dev = idx2.device_arrays(mesh)
    search = make_dense_search(len(dev), k=12, mesh=mesh, int8=True)
    q = rng.normal(size=(8, 16)).astype(np.float32)
    scores, docs = search(jnp.asarray(q), jnp.int32(8),
                          *flatten_device_buckets(dev))
    want = brute(q, dequantized(idx2))
    order = np.argsort(-want)
    np.testing.assert_array_equal(np.asarray(docs), order[:12])
    # gather_doc_reps dequantizes for the rerank stage
    mv = idx2.gather_doc_reps([int(docs[0])], max_sents=12)
    ln = int(mv.lens[0])
    np.testing.assert_allclose(np.asarray(mv.embed)[0, :ln],
                               dequantized(idx2)[int(docs[0])], rtol=1e-6)


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


def test_prequantized_build_matches_host_quantize(rng):
    """Device-side quantization path: packing int8+scales produced elsewhere
    must reproduce build_dense_index(dtype='int8') exactly (same quantized
    values in, same buckets/norms/scales out)."""
    from aspire_tpu.index.dense import build_dense_index_prequantized

    reps = [rng.normal(size=(int(rng.integers(1, 10)), 16))
            .astype(np.float32) for _ in range(40)]
    pids = [f"p{i}" for i in range(40)]
    host = build_dense_index(reps, pids, dtype="int8")
    # quantize the same way encode_quantized does (round-half-even)
    quant = []
    for r in reps:
        sc = np.abs(r).max(axis=1) / 127.0
        sc = np.where(sc > 0, sc, 1.0).astype(np.float32)
        xi = np.clip(np.rint(r / sc[:, None]), -127, 127).astype(np.int8)
        quant.append((xi, sc))
    pre = build_dense_index_prequantized(quant, pids)
    assert len(pre.buckets) == len(host.buckets)
    for bh, bp in zip(host.buckets, pre.buckets):
        np.testing.assert_array_equal(bh["sents"], bp["sents"])
        np.testing.assert_array_equal(bh["doc_idx"], bp["doc_idx"])
        np.testing.assert_allclose(bh["scales"], bp["scales"], rtol=1e-6)
        np.testing.assert_allclose(bh["norms"], bp["norms"], rtol=1e-5)
    np.testing.assert_array_equal(host.doc_lens, pre.doc_lens)


def test_encode_quantized_matches_encode(rng, tmp_path):
    """encode_quantized must return the int8 quantization of encode's reps."""
    import json
    import jax.numpy as jnp
    from transformers import AutoTokenizer
    from aspire_tpu.evaluation.models import AspireSimilarityModel
    from aspire_tpu.models.bert import BertConfig
    tok_dir = tmp_path / "vb"
    tok_dir.mkdir()
    (tok_dir / "vocab.txt").write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "a", "b", "c"]))
    (tok_dir / "tokenizer_config.json").write_text(
        json.dumps({"tokenizer_class": "BertTokenizer", "do_lower_case": True}))
    cfg = BertConfig.tiny()
    import jax
    from aspire_tpu.models.encoders import ConSentEncoder
    enc = ConSentEncoder(cfg, max_sents=8)
    tok = AutoTokenizer.from_pretrained(str(tok_dir))
    t = jnp.zeros((1, 16), jnp.int32)
    params = enc.init(jax.random.key(0), t, t, t)["params"]
    model = AspireSimilarityModel("m", cfg, params, tok, max_sents=8,
                                  batch_size=2)
    papers = [{"TITLE": "a b", "ABSTRACT": ["alpha beta gamma", "delta"]},
              {"TITLE": "c", "ABSTRACT": ["epsilon zeta"]}]
    encs = model.encode(papers)
    quants = model.encode_quantized(papers)
    for e, (xi, sc) in zip(encs, quants):
        assert xi.dtype == np.int8 and len(xi) == len(e) == len(sc)
        sc_ref = np.abs(e).max(axis=1) / 127.0
        sc_ref = np.where(sc_ref > 0, sc_ref, 1.0)
        np.testing.assert_allclose(sc, sc_ref, rtol=1e-5)
        xi_ref = np.clip(np.rint(e / sc_ref[:, None]), -127, 127)
        # device and host rounding agree except exactly at .5 boundaries
        assert (np.abs(xi.astype(np.int32)
                       - xi_ref.astype(np.int32)) <= 1).mean() == 1.0
        agree = (xi.astype(np.int32) == xi_ref.astype(np.int32)).mean()
        assert agree > 0.99


def test_seq_bucketed_encode_matches_full(rng, tmp_path):
    """seq_buckets trims inert pad columns: reps must match the 512-padded
    encode to float-reduction tolerance."""
    import json
    import jax
    import jax.numpy as jnp
    from transformers import AutoTokenizer
    from aspire_tpu.evaluation.models import AspireSimilarityModel
    from aspire_tpu.models.bert import BertConfig
    from aspire_tpu.models.encoders import ConSentEncoder
    tok_dir = tmp_path / "vb"
    tok_dir.mkdir()
    (tok_dir / "vocab.txt").write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "alpha", "beta", "gamma", "delta", "epsilon", "zeta"]))
    (tok_dir / "tokenizer_config.json").write_text(
        json.dumps({"tokenizer_class": "BertTokenizer", "do_lower_case": True}))
    cfg = BertConfig.tiny()
    enc = ConSentEncoder(cfg, max_sents=8)
    tok = AutoTokenizer.from_pretrained(str(tok_dir))
    t = jnp.zeros((1, 16), jnp.int32)
    params = enc.init(jax.random.key(0), t, t, t)["params"]
    papers = [{"TITLE": "alpha", "ABSTRACT": ["beta gamma delta", "epsilon"]},
              {"TITLE": "zeta", "ABSTRACT": ["alpha beta"]}]
    full = AspireSimilarityModel("m", cfg, params, tok, max_sents=8,
                                 batch_size=2)
    buck = AspireSimilarityModel("m", cfg, params, tok, max_sents=8,
                                 batch_size=2, seq_buckets=(64, 128, 512))
    # a batch longer than EVERY bucket must keep its full length (trimming
    # there would cut real tokens): tiny buckets, long doc
    over = AspireSimilarityModel("m", cfg, params, tok, max_sents=8,
                                 batch_size=2, seq_buckets=(4, 8))
    long_paper = [{"TITLE": "alpha", "ABSTRACT": ["beta gamma " * 20]}]
    np.testing.assert_allclose(full.encode(long_paper)[0],
                               over.encode(long_paper)[0], rtol=2e-5, atol=2e-5)
    e_full = full.encode(papers)
    e_buck = buck.encode(papers)
    for a, b in zip(e_full, e_buck):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)
    # quantized path rides the same bucketed arrays
    q_full = full.encode_quantized(papers)
    q_buck = buck.encode_quantized(papers)
    for (xa, sa), (xb, sb) in zip(q_full, q_buck):
        np.testing.assert_allclose(sa, sb, rtol=1e-4)
        assert (np.abs(xa.astype(np.int32) - xb.astype(np.int32)) <= 1).all()


def test_int_pids_survive_save_load(rng, tmp_path):
    """JSON object keys stringify: integer paper ids must round-trip as
    ints (pids.json ordered list) or gold-pool lookups miss every doc."""
    reps, _ = make_corpus(rng, n_docs=6)
    idx = build_dense_index(reps, pids=[101, 102, 103, 104, 105, 106],
                            dtype=np.float32)
    idx.save(tmp_path / "ip")
    idx2 = DenseBucketIndex.load(tmp_path / "ip")
    assert idx2.pids == [101, 102, 103, 104, 105, 106]
    assert all(isinstance(p, int) for p in idx2.pids)


def test_cosine_index_matches_cosine_oracle(rng, tmp_path):
    """A --family sent index (normalized reps, score_type='cosine') must
    rank by cosine max-sim and the L2->cosine score conversion must return
    the reference's cosine values (pp_gen_nearest.py:793-794)."""
    reps, pids = make_corpus(rng, n_docs=40)
    unit = [r / np.linalg.norm(r, axis=1, keepdims=True) for r in reps]
    idx = build_dense_index(unit, pids, dtype=np.float32,
                            score_type="cosine")
    idx.save(tmp_path / "cosi")
    idx2 = DenseBucketIndex.load(tmp_path / "cosi")
    assert idx2.score_type == "cosine"

    q = rng.normal(size=(3, 16)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    dev = idx2.device_arrays()
    search = make_dense_search(len(dev), k=10)
    qpad = np.zeros((8, 16), np.float32)
    qpad[:3] = q
    v, docs = search(jnp.asarray(qpad), jnp.int32(3),
                     *flatten_device_buckets(dev))
    v, docs = np.asarray(v), np.asarray(docs)

    # oracle: per-doc max cosine over (query sent, doc sent) pairs
    want = np.array([np.max(q @ r.T) for r in unit])
    order = np.argsort(-want)
    np.testing.assert_array_equal(docs, order[:10])
    cos = 1.0 - v * v / 2.0            # the rank CLI's conversion
    np.testing.assert_allclose(cos, want[order[:10]], rtol=1e-5, atol=1e-5)


def test_fine_buckets_match_coarse_exact(rng):
    """The 1M-doc capacity packing ((8,12,16,20,24) int8, RESULTS_r5.md)
    returns bit-identical rankings/scores to the coarse (12,24) config:
    bucket boundaries change padding only, never stored values or scores."""
    reps, pids = make_corpus(rng, n_docs=120, d=16, max_s=24)
    q = rng.normal(size=(5, 16)).astype(np.float32)
    qpad = np.zeros((8, 16), np.float32)
    qpad[:5] = q
    outs = []
    for buckets in ((12, 24), (8, 12, 16, 20, 24)):
        idx = build_dense_index(reps, pids, buckets=buckets, dtype="int8")
        dev = idx.device_arrays()
        search = make_dense_search(len(dev), k=10, int8=True)
        v, d = search(jnp.asarray(qpad), jnp.int32(5),
                      *flatten_device_buckets(dev))
        outs.append((np.asarray(v), np.asarray(d)))
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=2e-6, atol=2e-6)
