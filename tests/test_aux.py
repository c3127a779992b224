"""Tests for auxiliary components: NER sidecar, mix sampler, CLS index,
diagnostics, shuffled streams."""
import json
import numpy as np
import jax.numpy as jnp
import pytest

from aspire_tpu.data.ner import simple_entity_extractor, write_ner_file
from aspire_tpu.data.mix import sample_merge, shuffle_file
from aspire_tpu.index.cls import pack_cls_index, cls_search, make_sharded_cls_search
from aspire_tpu.parallel.mesh import make_serving_mesh


def test_simple_entity_extractor():
    ents = simple_entity_extractor(
        "We use Optimal Transport (OT) and multi-vector co-citation signals.")
    assert "OT" in ents
    assert "Optimal Transport" in ents
    assert any("co-citation" in e for e in ents)


def test_write_ner_file(tmp_path):
    with open(tmp_path / "abstracts-toy.jsonl", "w") as f:
        f.write(json.dumps({"paper_id": "p1", "title": "T",
                            "abstract": ["We use Graph Neural Networks here.",
                                         "plain sentence."]}) + "\n")
    n = write_ner_file(str(tmp_path / "abstracts-toy.jsonl"),
                       str(tmp_path / "toy-ner.jsonl"))
    assert n == 1
    data = json.load(open(tmp_path / "toy-ner.jsonl"))
    assert len(data["p1"]) == 2
    assert "Graph Neural Networks" in data["p1"][0]


def test_ner_cli(tmp_path):
    from aspire_tpu.cli import main
    with open(tmp_path / "abstracts-toy.jsonl", "w") as f:
        f.write(json.dumps({"paper_id": "p1", "title": "T",
                            "abstract": ["We use Graph Neural Networks."]}) + "\n")
    out = tmp_path / "toy-ner.jsonl"
    main(["ner", "--abstracts", str(tmp_path / "abstracts-toy.jsonl"),
          "--out", str(out)])
    data = json.load(open(out))
    assert "Graph Neural Networks" in data["p1"][0]


def test_scispacy_gate():
    from aspire_tpu.data.ner import scispacy_entity_extractor
    try:
        import spacy  # noqa: F401
        pytest.skip("spacy installed; gate not exercisable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="simple_entity_extractor"):
        scispacy_entity_extractor()


def test_sample_merge_and_shuffle(tmp_path):
    a = tmp_path / "a.jsonl"
    b = tmp_path / "b.jsonl"
    a.write_text("".join(f'{{"x": {i}}}\n' for i in range(100)))
    b.write_text("".join(f'{{"y": {i}}}\n' for i in range(100)))
    n = sample_merge([(str(a), 40), (str(b), 60)], str(tmp_path / "mix.jsonl"))
    assert n == 100
    lines = open(tmp_path / "mix.jsonl").read().splitlines()
    xs = sum(1 for l in lines if '"x"' in l)
    assert xs == 40
    # deterministic
    sample_merge([(str(a), 40), (str(b), 60)], str(tmp_path / "mix2.jsonl"))
    assert open(tmp_path / "mix2.jsonl").read() == open(tmp_path / "mix.jsonl").read()
    m = shuffle_file(str(a), str(tmp_path / "ash.jsonl"), seed=3)
    assert m == 100
    assert sorted(open(tmp_path / "ash.jsonl").read().splitlines()) == \
        sorted(a.read_text().splitlines())


def test_cls_search(rng):
    reps = rng.normal(size=(200, 32)).astype(np.float32)
    q = rng.normal(size=(32,)).astype(np.float32)
    packed, norms = pack_cls_index(reps, dtype=np.float32)
    scores, idx = cls_search(jnp.asarray(q), jnp.asarray(packed),
                             jnp.asarray(norms), 10)
    want = -np.linalg.norm(reps - q[None], axis=1)
    order = np.argsort(-want)
    np.testing.assert_array_equal(np.asarray(idx), order[:10])
    np.testing.assert_allclose(np.asarray(scores), want[order[:10]],
                               rtol=1e-4, atol=1e-4)


def test_cls_search_sharded(rng):
    mesh = make_serving_mesh()
    reps = rng.normal(size=(2048, 32)).astype(np.float32)
    q = rng.normal(size=(32,)).astype(np.float32)
    packed, norms = pack_cls_index(reps, n_shards=8, dtype=np.float32)
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P("shard"))
    search = make_sharded_cls_search(mesh, 10)
    scores, idx = search(jnp.asarray(q),
                         jax.device_put(jnp.asarray(packed), sh),
                         jax.device_put(jnp.asarray(norms), sh))
    want = -np.linalg.norm(reps - q[None], axis=1)
    order = np.argsort(-want)
    np.testing.assert_array_equal(np.asarray(idx), order[:10])


def test_diagnostics_report(rng, capsys):
    from aspire_tpu.core.types import MultiVec
    from aspire_tpu.evaluation.diagnostics import pair_report
    q = MultiVec(embed=jnp.asarray(rng.normal(size=(1, 4, 8)).astype(np.float32)),
                 lens=jnp.asarray([3]))
    c = MultiVec(embed=jnp.asarray(rng.normal(size=(1, 5, 8)).astype(np.float32)),
                 lens=jnp.asarray([4]))
    rep = pair_report(q, c, q_sents=["a", "b", "c"], c_sents=["d", "e", "f", "g"])
    out = capsys.readouterr().out
    assert "transport plan" in out and "best single match" in out
    assert rep["sims"].shape == (3, 4)
    np.testing.assert_allclose(rep["plan"].sum(), 1.0, atol=0.05)


def test_shuffled_stream(tmp_path, rng):
    from aspire_tpu.data.readers import TripleStream
    from aspire_tpu.core.config import ModelHParams
    from transformers import BertTokenizer
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "a", "b", "title"]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab))
    tok = BertTokenizer(str(tmp_path / "vocab.txt"))
    with open(tmp_path / "t.jsonl", "w") as f:
        for i in range(16):
            d = {"TITLE": "title", "ABSTRACT": ["a b"] * ((i % 3) + 1)}
            f.write(json.dumps({"query": d, "pos_context": d}) + "\n")
    hp = ModelHParams(max_sents=4)
    s1 = TripleStream(str(tmp_path / "t.jsonl"), tok, hp, micro_batch=4,
                      n_micro=2, seq_len=16, shuffle_seed=1)
    b1 = [b["query"]["abs_lens"] for b in s1]
    b2 = [b["query"]["abs_lens"] for b in s1]  # epoch 2: different order
    assert len(b1) == 2
    flat1 = np.concatenate([x.ravel() for x in b1])
    flat2 = np.concatenate([x.ravel() for x in b2])
    assert sorted(flat1.tolist()) == sorted(flat2.tolist())
    assert not np.array_equal(flat1, flat2)


def test_bucketed_stream(tmp_path, rng):
    from aspire_tpu.data.readers import TripleStream
    from aspire_tpu.core.config import ModelHParams
    from transformers import BertTokenizer
    words = ["a", "b", "c", "d"]
    (tmp_path / "v2.txt").write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "title"] + words))
    tok = BertTokenizer(str(tmp_path / "v2.txt"))
    import json as _json
    with open(tmp_path / "tb.jsonl", "w") as f:
        for i in range(24):
            # alternate short and long docs
            n_words = 4 if i % 2 == 0 else 40
            d = {"TITLE": "title",
                 "ABSTRACT": [" ".join(rng.choice(words, n_words))]}
            f.write(_json.dumps({"query": d, "pos_context": d}) + "\n")
    hp = ModelHParams(max_sents=4)
    stream = TripleStream(str(tmp_path / "tb.jsonl"), tok, hp, micro_batch=2,
                          n_micro=2, seq_buckets=(16, 64))
    batches = list(stream)
    seqs = sorted({b["query"]["token_ids"].shape[-1] for b in batches})
    # both buckets appear; alternating docs put every micro in the long
    # bucket unless batch composition isolates shorts -- with micro=2 and
    # alternating lengths every micro mixes -> all long. Re-check: micro_batch
    # 2 takes examples (0,1) = short+long -> 64. So only 64 appears.
    assert seqs == [64]
    # now a sorted-ish file: all shorts first
    with open(tmp_path / "tb2.jsonl", "w") as f:
        for i in range(24):
            n_words = 4 if i < 12 else 40
            d = {"TITLE": "title",
                 "ABSTRACT": [" ".join(rng.choice(words, n_words))]}
            f.write(_json.dumps({"query": d, "pos_context": d}) + "\n")
    stream2 = TripleStream(str(tmp_path / "tb2.jsonl"), tok, hp, micro_batch=2,
                           n_micro=2, seq_buckets=(16, 64))
    batches2 = list(stream2)
    seqs2 = sorted({b["query"]["token_ids"].shape[-1] for b in batches2})
    assert seqs2 == [16, 64]
    # all full superbatches consumed: 24 examples / (2*2) = 6 superbatches
    assert len(batches2) == 6


def test_bucketed_truncation_matches_unbucketed(tmp_path, rng):
    """--seq-buckets must change only the padding, never which tokens a doc
    trains on: a doc past the 500-token reference cap (MAX_NUM_TOKS) must
    truncate identically in bucketed and non-bucketed streams."""
    from aspire_tpu.data.readers import TripleStream
    from aspire_tpu.core.config import ModelHParams
    from transformers import BertTokenizer
    words = ["a", "b", "c", "d"]
    (tmp_path / "v3.txt").write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "title"] + words))
    tok = BertTokenizer(str(tmp_path / "v3.txt"))
    import json as _json
    # 3 sentences x 200 words = 600 content tokens > the 500-token cap
    d = {"TITLE": "title",
         "ABSTRACT": [" ".join(rng.choice(words, 200)) for _ in range(3)]}
    with open(tmp_path / "long.jsonl", "w") as f:
        for _ in range(2):
            f.write(_json.dumps({"query": d, "pos_context": d}) + "\n")
    hp = ModelHParams(max_sents=4)
    kw = dict(micro_batch=2, n_micro=1)
    plain = next(iter(TripleStream(str(tmp_path / "long.jsonl"), tok, hp,
                                   seq_len=512, **kw)))
    bucketed = next(iter(TripleStream(str(tmp_path / "long.jsonl"), tok, hp,
                                      seq_buckets=(128, 512), **kw)))
    for k in ("token_ids", "attn_mask", "sent_ids", "abs_lens"):
        np.testing.assert_array_equal(plain["query"][k], bucketed["query"][k])
