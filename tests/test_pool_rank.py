"""Pool-restricted ranking through the serving machinery.

The reference's primary evaluation protocol scores each query against its
candidate POOL (caching_scoringmodel_rank_pool_sent,
pp_gen_nearest.py:241-283; rank_pool* variants :729-985).  These tests pin
the device pool scorers (index.serve.make_pool_rank_batched /
make_cls_pool_rank_batched) to the evaluate-path scoring oracle
(ops.distances on host-packed MultiVecs, diameter='pair' OT) and to
single-device == sharded parity.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aspire_tpu.core.types import MultiVec
from aspire_tpu.index.dense import build_dense_index, flatten_device_buckets
from aspire_tpu.index.serve import (
    make_pool_rank_batched, make_cls_pool_rank_batched,
)
from aspire_tpu.ops.distances import wasserstein_dist, l2max_dist

DIM = 16
MS = 10


def _mk_index(rng, n_docs, dtype=np.float32, n_shards=1):
    reps = [rng.normal(size=(int(rng.integers(1, MS)), DIM))
            .astype(np.float32) for _ in range(n_docs)]
    idx = build_dense_index(reps, [f"p{i}" for i in range(n_docs)],
                            dtype=dtype, n_shards=n_shards)
    return idx, reps


def _pack(encs, smax):
    k = len(encs)
    out = np.zeros((k, smax, DIM), np.float32)
    lens = np.zeros((k,), np.int32)
    for i, e in enumerate(encs):
        out[i, : len(e)] = e
        lens[i] = len(e)
    return MultiVec(embed=jnp.asarray(out), lens=jnp.asarray(lens))


def _oracle(agg, q, q_len, cand_reps, temp=5.0):
    """Evaluate-path scoring: host-packed MultiVecs through ops.distances
    (what AspireSimilarityModel._pair_scores runs per chunk)."""
    k = len(cand_reps)
    qm = _pack([q[:q_len]] * k, MS)
    cm = _pack(cand_reps, MS)
    if agg == "ot":
        s, _ = wasserstein_dist(qm, cm, temp=temp, return_pair_sims=True,
                                diameter="pair")
    else:
        s, _ = l2max_dist(qm, cm, return_pair_sims=True)
    return np.asarray(s)


@pytest.mark.parametrize("agg", ["l2max", "ot"])
def test_pool_rank_matches_evaluate_path_oracle(rng, agg):
    idx, reps = _mk_index(rng, 30)
    flat = flatten_device_buckets(idx.device_arrays())
    pos = idx.device_pos_arrays()
    B, qmax, P = 3, 8, 16
    q = rng.normal(size=(B, qmax, DIM)).astype(np.float32)
    q_lens = rng.integers(1, qmax + 1, B).astype(np.int32)
    for i in range(B):
        q[i, q_lens[i]:] = 0
    cand_ids = np.full((B, P), -1, np.int32)
    pools = []
    for i in range(B):
        n = int(rng.integers(3, P + 1))
        ids = rng.choice(len(reps), n, replace=False).astype(np.int32)
        cand_ids[i, :n] = ids
        pools.append(ids)
    fn = make_pool_rank_batched(len(idx.buckets), pool_size=P, max_sents=MS,
                                agg=agg, temp=5.0)
    sims = np.asarray(fn(jnp.asarray(q), jnp.asarray(q_lens),
                         jnp.asarray(cand_ids), *flat, *pos))
    for i in range(B):
        n = len(pools[i])
        want = _oracle(agg, q[i], int(q_lens[i]),
                       [reps[d] for d in pools[i]], temp=5.0)
        np.testing.assert_allclose(sims[i, :n], want, rtol=2e-5, atol=2e-5)
        assert (sims[i, n:] < -1e29).all()   # pads NEG


@pytest.mark.parametrize("dtype", [np.float32, "int8"])
def test_pool_rank_sharded_matches_single_device(rng, dtype):
    from aspire_tpu.parallel.mesh import make_serving_mesh
    n_shards = len(jax.devices())
    mesh = make_serving_mesh(n_shards=n_shards)
    idx, reps = _mk_index(rng, 64, dtype=dtype, n_shards=n_shards)
    nb = len(idx.buckets)
    B, qmax, P = 2, 6, 24
    q = rng.normal(size=(B, qmax, DIM)).astype(np.float32)
    q_lens = np.full((B,), qmax, np.int32)
    cand_ids = np.stack([
        rng.choice(len(reps), P, replace=False).astype(np.int32)
        for _ in range(B)])
    cand_ids[0, -3:] = -1
    f1 = make_pool_rank_batched(nb, pool_size=P, max_sents=MS, agg="ot",
                                int8=idx.is_int8, temp=5.0)
    fN = make_pool_rank_batched(nb, pool_size=P, max_sents=MS, agg="ot",
                                int8=idx.is_int8, mesh=mesh, temp=5.0)
    s1 = np.asarray(f1(jnp.asarray(q), jnp.asarray(q_lens),
                       jnp.asarray(cand_ids),
                       *flatten_device_buckets(idx.device_arrays()),
                       *idx.device_pos_arrays()))
    sN = np.asarray(fN(jnp.asarray(q), jnp.asarray(q_lens),
                       jnp.asarray(cand_ids),
                       *flatten_device_buckets(idx.device_arrays(mesh)),
                       *idx.device_pos_arrays(mesh)))
    np.testing.assert_allclose(s1, sN, rtol=2e-5, atol=2e-5)


def test_cls_pool_rank_matches_numpy(rng):
    from aspire_tpu.index.cls import build_cls_index
    n = 40
    reps = rng.normal(size=(n, DIM)).astype(np.float32)
    idx = build_cls_index(reps, [f"p{i}" for i in range(n)], dtype=np.float32)
    B, P = 3, 8
    q = rng.normal(size=(B, DIM)).astype(np.float32)
    cand_ids = np.stack([rng.choice(n, P, replace=False).astype(np.int32)
                         for _ in range(B)])
    cand_ids[1, -2:] = -1
    fn = make_cls_pool_rank_batched()
    dr, dn = idx.device_arrays()
    sims = np.asarray(fn(jnp.asarray(q), jnp.asarray(cand_ids), dr, dn))
    for i in range(B):
        for j in range(P):
            d = cand_ids[i, j]
            if d < 0:
                assert sims[i, j] < -1e29
            else:
                want = -np.linalg.norm(q[i] - reps[d])
                np.testing.assert_allclose(sims[i, j], want, atol=1e-5)


def test_cls_pool_rank_sharded_matches_single(rng):
    from aspire_tpu.index.cls import build_cls_index
    from aspire_tpu.parallel.mesh import make_serving_mesh
    n_shards = len(jax.devices())
    mesh = make_serving_mesh(n_shards=n_shards)
    n = 128 * n_shards  # pad-free even split
    reps = rng.normal(size=(n, DIM)).astype(np.float32)
    idx = build_cls_index(reps, [f"p{i}" for i in range(n)], dtype=np.float32)
    B, P = 2, 16
    q = rng.normal(size=(B, DIM)).astype(np.float32)
    cand_ids = np.stack([rng.choice(n, P, replace=False).astype(np.int32)
                         for _ in range(B)])
    f1 = make_cls_pool_rank_batched()
    fN = make_cls_pool_rank_batched(mesh)
    s1 = np.asarray(f1(jnp.asarray(q), jnp.asarray(cand_ids),
                       *idx.device_arrays()))
    sN = np.asarray(fN(jnp.asarray(q), jnp.asarray(cand_ids),
                       *idx.device_arrays(mesh)))
    np.testing.assert_allclose(s1, sN, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# protocol errors (evaluation.protocols.ranked_relevances)

def test_ranked_relevances_out_of_pool_raises_named_error():
    from aspire_tpu.evaluation.protocols import (
        ranked_relevances, PoolMismatchError)
    gold = {"q1": {"a": 2, "b": 0}}
    ranked = {"q1": [("a", 0.9), ("zzz", 0.8), ("b", 0.1)]}
    with pytest.raises(PoolMismatchError) as ei:
        ranked_relevances(ranked, gold)
    assert "zzz" in str(ei.value) and "q1" in str(ei.value)
    # unknown query is named too
    with pytest.raises(PoolMismatchError) as ei2:
        ranked_relevances({"qX": [("a", 1.0)]}, gold)
    assert "qX" in str(ei2.value)


def test_ranked_relevances_intersect_keeps_denominators():
    from aspire_tpu.evaluation.protocols import ranked_relevances
    gold = {"q1": {"a": 2, "b": 0, "c": 2}}
    # ranking dropped pool member 'c' (relevant!) and added out-of-pool 'z'
    ranked = {"q1": [("a", 0.9), ("z", 0.8), ("b", 0.1)]}
    rels = ranked_relevances(ranked, gold, on_missing="intersect")
    # 'z' dropped; omitted 'c' appended at the END so it counts as a miss
    assert rels["q1"] == [2, 0, 2]
    from aspire_tpu.evaluation.metrics import compute_metrics
    m = compute_metrics(rels["q1"], threshold_grade=2)
    # the omitted relevant doc drags AP below the 1.0 a shrunken list would
    # report: AP = mean(P@1, P@3) = mean(1, 2/3)
    assert m["av_precision"] == pytest.approx(5 / 6)


# ---------------------------------------------------------------------------
# trained OT hyperparameters thread into `rank` (cli._resolve_ot_params)

def test_rank_uses_trained_ot_hparams():
    """A model trained with sent_sm_temp=1.0 must rerank with 1.0 when no
    flag is passed (r3 verdict weak #2; reference re-reads run_info for
    this, pp_gen_nearest.py:96-98)."""
    from argparse import Namespace
    from aspire_tpu.cli import _resolve_ot_params

    class FakeModel:
        ot_temp, blur, scaling = 1.0, 0.07, 0.85

    args = Namespace(ot_temp=None, ot_blur=None, ot_scaling=None,
                     run_dir=None)
    temp, blur, scaling = _resolve_ot_params(args, FakeModel())
    assert (temp, blur, scaling) == (1.0, 0.07, 0.85)
    # explicit flag overrides (with a warning) but the others stay trained
    args2 = Namespace(ot_temp=5000.0, ot_blur=None, ot_scaling=None,
                      run_dir=None)
    temp2, blur2, scaling2 = _resolve_ot_params(args2, FakeModel())
    assert (temp2, blur2, scaling2) == (5000.0, 0.07, 0.85)
    # no trained source at all -> reference otstuni defaults
    args3 = Namespace(ot_temp=None, ot_blur=None, ot_scaling=None,
                      run_dir=None)
    assert _resolve_ot_params(args3, None) == (5000.0, 0.05, 0.9)


def test_rank_reads_run_info_ot_hparams(tmp_path):
    """Without a loaded model, the run_dir's run_info.json is the source."""
    import json
    from argparse import Namespace
    from aspire_tpu.cli import _resolve_ot_params
    from aspire_tpu.core.config import RunConfig

    cfg = RunConfig.from_dict({
        "model_name": "miswordbienc", "score_aggregation": "l2wasserstein",
        "sent_sm_temp": 1.0, "geoml_blur": 0.04, "geoml_scaling": 0.8})
    cfg.to_run_info(tmp_path / "run_info.json")
    args = Namespace(ot_temp=None, ot_blur=None, ot_scaling=None,
                     run_dir=str(tmp_path))
    assert _resolve_ot_params(args) == (1.0, 0.04, 0.8)
