"""Query-time ranking over the sharded multi-vector index.

Replaces the reference's host-side ranking engines (sklearn NearestNeighbors
and big numpy matmuls, pp_gen_nearest.py:638-985) with device-resident
scoring:

  l2max first stage: one [q_sents, dim] x [dim, shard_len] MXU matmul per
  shard -> per-sentence best-query similarity -> segment-max over doc labels
  -> per-doc scores -> top-k.  Multi-chip: shard_map over the `shard` mesh
  axis with an ICI max-reduce merging per-shard doc scores, then a replicated
  top-k.  (Distances compare via squared L2 -- monotonic with the reference's
  -cdist ranking; exposed scores take the sqrt to match reference values.)

  OT second stage: gather the top candidates' sentence reps and run the
  batched Sinkhorn scorer (ops.distances.wasserstein_dist) -- the reference's
  caching_scoringmodel rerank path (pp_gen_nearest.py:207-363).
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.types import MultiVec
from ..ops.distances import wasserstein_dist, l2max_dist

NEG = -1e30


def _per_doc_scores(q_sents: jax.Array, q_len: jax.Array, sents: jax.Array,
                    doc_ids: jax.Array, n_docs: int) -> jax.Array:
    """Per-doc l2max similarity scores for one flat sentence shard.

    q_sents: f32[sq, d]; sents: [L, d] (any float dtype); doc_ids: i32[L];
    -> f32[n_docs] (NEG where a doc has no sentences in this shard).
    """
    q = q_sents.astype(jnp.float32)
    qq = jnp.sum(q * q, axis=1)[:, None]
    # read the corpus in its STORAGE dtype (bf16 indexes halve HBM traffic;
    # an astype(f32) here would materialize a corpus-sized f32 copy every
    # query) -- both einsums accumulate f32 on the MXU, the dense-bucket
    # path's semantics
    xx = jnp.einsum("ld,ld->l", sents, sents,
                    preferred_element_type=jnp.float32)[None, :]
    qx = jnp.einsum("sd,ld->sl", q.astype(sents.dtype), sents,
                    preferred_element_type=jnp.float32)
    d2 = jnp.maximum(qq + xx - 2.0 * qx, 0.0)                     # [sq, L]
    neg = -jnp.sqrt(d2)
    # mask invalid query sentences
    qmask = jnp.arange(q.shape[0], dtype=jnp.int32) < q_len
    neg = jnp.where(qmask[:, None], neg, NEG)
    per_sent = jnp.max(neg, axis=0)                               # [L]
    per_sent = jnp.where(doc_ids >= 0, per_sent, NEG)
    return jax.ops.segment_max(per_sent, jnp.maximum(doc_ids, 0),
                               num_segments=n_docs)


@partial(jax.jit, static_argnames=("n_docs", "k"))
def l2max_search(q_sents, q_len, sents, doc_ids, n_docs: int, k: int):
    """Single-device search. sents: [n_shards, L, d] or [L, d]."""
    if sents.ndim == 3:
        sents = sents.reshape(-1, sents.shape[-1])
        doc_ids = doc_ids.reshape(-1)
    scores = _per_doc_scores(q_sents, q_len, sents, doc_ids, n_docs)
    return jax.lax.top_k(scores, k)


def make_sharded_search(mesh: Mesh, n_docs: int, k: int):
    """Build the jitted multi-chip search: per-shard top-k + all_gather merge.

    Index arrays must be sharded over `shard` on axis 0 ([n_shards, L, ...]).
    The returned fn takes (q_sents, q_len, sents, doc_ids) with the query
    replicated, and returns replicated (top-k scores, top-k doc indices).

    Documents never span shards (build_index_from_reps packs whole docs), so
    each shard's per-doc scores are complete: merge by gathering the k local
    winners per shard and re-top-k'ing the n_shards*k pool.  ICI moves
    2*k*n_shards values instead of the full n_docs score vector the previous
    pmax merge all-reduced.
    """
    if k > n_docs:
        # the gathered pool would hold NEG-filled duplicates of real doc ids,
        # so the final top-k could return the same doc twice -- refuse loudly
        raise ValueError(f"k={k} exceeds the index's n_docs={n_docs}")

    def _local(q_sents, q_len, sents, doc_ids):
        # block-local views: sents [1, L, d]; doc_ids [1, L]
        scores = _per_doc_scores(q_sents, q_len, sents[0], doc_ids[0], n_docs)
        loc_v, loc_i = jax.lax.top_k(scores, k)
        all_v = jax.lax.all_gather(loc_v, "shard").reshape(-1)
        all_i = jax.lax.all_gather(loc_i, "shard").reshape(-1)
        values, pos = jax.lax.top_k(all_v, k)
        return values, all_i[pos]

    fn = shard_map(
        _local, mesh=mesh,
        in_specs=(P(), P(), P("shard"), P("shard")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def gather_doc_reps(index, doc_idx: np.ndarray, max_sents: int) -> MultiVec:
    """Host-side gather of candidate sentence reps for the rerank stage.

    index: MultiVecIndex; doc_idx: [k] global doc indices.
    Returns a padded MultiVec [k, max_sents, dim] (f32).
    """
    flat_sents = index.sents.reshape(-1, index.dim)
    flat_ids = index.doc_ids.reshape(-1)
    order = np.argsort(flat_ids, kind="stable")
    sorted_ids = flat_ids[order]
    starts = np.searchsorted(sorted_ids, doc_idx, side="left")
    k = len(doc_idx)
    out = np.zeros((k, max_sents, index.dim), np.float32)
    lens = np.zeros((k,), np.int32)
    for i, di in enumerate(doc_idx):
        if di < 0:      # pad slot (pool < k): zero rows, not index -1
            continue
        ln = min(int(index.doc_lens[di]), max_sents)
        rows = order[starts[i]: starts[i] + ln]
        out[i, :ln] = flat_sents[rows]
        lens[i] = ln
    return MultiVec(embed=jnp.asarray(out), lens=jnp.asarray(lens))


@partial(jax.jit, static_argnames=("blur", "scaling", "temp", "max_iters",
                                   "solver"))
def ot_rerank(q: MultiVec, cands: MultiVec, blur: float = 0.05,
              scaling: float = 0.9, temp: float = 1.0, max_iters: int = 128,
              solver: str = "pallas"):
    """Batched Sinkhorn rerank of k candidates against one query.

    q: MultiVec with batch 1; cands: MultiVec with batch k.
    Returns f32[k] OT similarity scores (plan-weighted similarity sums).

    Latency note: the geomloss-parity schedule (scaling=0.9) costs ~60-80
    sequential iterations.  Serving needs no gradients, so the default
    solver is the pallas batch-on-lanes kernel -- measured 1.4-3.1x the XLA
    solve at serving k on v5e (k=50: 0.063 vs 0.197 ms; k=100: 0.060 vs
    0.101 ms; XLA pads non-lane-aligned k poorly).  Pass solver='xla' for
    strict reference-parity scores.  For latency-critical serving pass
    scaling=0.8, max_iters=64 ("fast OT"): ~half the iterations,
    near-identical rankings; scores deviate from reference parity slightly.
    """
    k = cands.embed.shape[0]
    q_tiled = MultiVec(
        embed=jnp.broadcast_to(q.embed, (k,) + q.embed.shape[1:]),
        lens=jnp.broadcast_to(q.lens, (k,)),
    )
    sims, _ = wasserstein_dist(q_tiled, cands, blur=blur, scaling=scaling,
                               temp=temp, return_pair_sims=True,
                               max_iters=max_iters, solver=solver)
    return sims


@partial(jax.jit, static_argnames=())
def l2max_rerank(q: MultiVec, cands: MultiVec):
    """Batched single-match rerank (exact reference scores incl. sqrt)."""
    k = cands.embed.shape[0]
    q_tiled = MultiVec(
        embed=jnp.broadcast_to(q.embed, (k,) + q.embed.shape[1:]),
        lens=jnp.broadcast_to(q.lens, (k,)),
    )
    sims, _ = l2max_dist(q_tiled, cands, return_pair_sims=True)
    return sims


def _gather_candidates(buckets, doc_bucket, doc_row, doc_lens, cand_ids,
                       max_sents: int, axis_name: str | None = None):
    """On-device candidate rep gather for the fused query path.

    buckets: device bucket dicts (block-local views inside shard_map);
    doc_bucket/doc_row/doc_lens: replicated [n_docs] inverse maps
    (DenseBucketIndex.device_pos_arrays); cand_ids: i32[k] global doc ids
    (-1 = pad).  Returns (embed f32[k, max_sents, d], lens i32[k],
    owned bool[k], valid bool[k]); under a mesh each shard fills only the
    rows it owns (zeros elsewhere) and `owned` marks them -- the caller
    reranks locally and psums the per-candidate scores, so only k floats
    cross ICI instead of the gathered [k, max_sents, d] block.

    Replaces the reference's host-side dict fetch of candidate reps
    (pp_gen_nearest.py:207-363) with pure device gathers: a trusted-region
    serving step never leaves the chip between search and rerank.
    """
    k = cand_ids.shape[0]
    valid = cand_ids >= 0
    cid = jnp.maximum(cand_ids, 0)
    cb = doc_bucket[cid]
    cr = doc_row[cid]
    cl = jnp.where(valid, jnp.minimum(doc_lens[cid], max_sents), 1)
    cl = jnp.maximum(cl, 1).astype(jnp.int32)
    dim = buckets[0]["sents"].shape[-1]
    me = None if axis_name is None else jax.lax.axis_index(axis_name)
    out = jnp.zeros((k, max_sents, dim), jnp.float32)
    owned = jnp.zeros((k,), bool)
    for bi, b in enumerate(buckets):
        sel = (cb == bi) & valid
        if me is None:
            rows = jnp.where(sel, cr, 0)
        else:
            local_n = b["sents"].shape[0]
            sel = sel & (cr // local_n == me)
            rows = jnp.where(sel, cr % local_n, 0)
        # The barrier hands the gather its own view of the bucket arrays.
        # Without it, sharing the operand with the search einsum makes XLA
        # co-optimize the two consumers and the whole query slows ~40%
        # (+0.7 ms at 125k docs on v5e -- measured; the k-row gather alone
        # is 0.014 ms).  Serving only, no gradients flow here.
        sents_b = jax.lax.optimization_barrier(b["sents"])
        reps = sents_b[rows].astype(jnp.float32)         # [k, s_b, d]
        if "scales" in b:
            scales_b = jax.lax.optimization_barrier(b["scales"])
            reps = reps * scales_b[rows][:, :, None]
        s_eff = min(reps.shape[1], max_sents)
        reps = reps[:, :s_eff]
        smask = jnp.arange(s_eff, dtype=jnp.int32)[None, :] < cl[:, None]
        reps = jnp.where((sel[:, None] & smask)[:, :, None], reps, 0.0)
        out = out.at[:, :s_eff].add(reps)
        owned = owned | sel
    return out, cl, owned, valid


_BIG = 3.0e38


def _mesh_pool_diameter(q, emb, owned, valid, axis_name):
    """Exact whole-pool annealing diameter, assembled over the mesh.

    Single-device geomloss semantics: the eps-schedule starts at the
    diameter of the box spanning ALL points of both clouds, pads included
    (ops/sinkhorn.py:max_diameter).  Under shard_map each shard holds only
    the candidate rows it owns (zeros elsewhere), so the local box is
    wrong; a pmin/pmax of the per-coordinate extrema over `axis_name`
    recovers the exact global box for 2*d floats of ICI traffic.

    Batched over query groups: q [B, qmax, d] (replicated); emb
    [B, k, ms, d] local gather; owned [B, k] this shard's candidates;
    valid [B, k] non-pad candidates (replicated).  Returns f32[B] -- one
    pmin/pmax pair total, 2*B*d floats of ICI.  Pad candidates contribute
    zero rows on every device in the single-device path, so the box
    closes over 0 when any exist.
    """
    sel = owned[:, :, None, None]
    y_min = jnp.min(jnp.where(sel, emb, _BIG), axis=(1, 2))     # [B, d]
    y_max = jnp.max(jnp.where(sel, emb, -_BIG), axis=(1, 2))
    y_min = jax.lax.pmin(y_min, axis_name)
    y_max = jax.lax.pmax(y_max, axis_name)
    pad0 = jnp.any(~valid, axis=1)[:, None]                     # [B, 1]
    mins = jnp.minimum(jnp.minimum(jnp.min(q, axis=1), y_min),
                       jnp.where(pad0, 0.0, _BIG))
    maxs = jnp.maximum(jnp.maximum(jnp.max(q, axis=1), y_max),
                       jnp.where(pad0, 0.0, -_BIG))
    return jnp.linalg.norm(maxs - mins, axis=-1)


def make_fused_query(n_buckets: int, k: int, max_sents: int,
                     int8: bool = False, mesh: Mesh | None = None,
                     blur: float = 0.05, scaling: float = 0.9,
                     temp: float = 1.0, max_iters: int = 128,
                     solver: str = "xla"):
    """ONE-dispatch serving query: search + candidate gather + OT rerank.

    The reference's query path is three host-mediated stages (NN scan,
    dict fetch of candidate reps, OT rescore -- pp_gen_nearest.py:207-363,
    729-985).  Here all three run inside a single jitted program, so a
    query costs one dispatch and one device_get regardless of backend
    distance; nothing touches the host in between.

    Returns fn(q [qmax, d], q_len, *bucket_arrays, doc_bucket, doc_row,
    doc_lens) -> (stage1 scores f32[k] (-L2, reference scale), doc_idx
    i32[k], ot_sims f32[k] (NEG at pad slots)).  Extra args come from
    DenseBucketIndex.device_arrays(mesh) + .device_pos_arrays(mesh).

    This IS the batched path at B=1 (same traced program modulo the
    leading axis), so the fused single == batched parity the tests assert
    holds by construction.  mesh: bucket arrays sharded over `shard`; each
    shard gathers and reranks only candidates whose rows it owns, then one
    psum of k floats merges the scores over ICI.
    """
    batched = make_fused_query_batched(
        n_buckets, k, max_sents, int8=int8, mesh=mesh, blur=blur,
        scaling=scaling, temp=temp, max_iters=max_iters, solver=solver)

    @jax.jit
    def single(q, q_len, *rest):
        v, d, s = batched(q[None], jnp.asarray(q_len, jnp.int32)[None], *rest)
        return v[0], d[0], s[0]

    return single


def make_fused_query_batched(n_buckets: int, k: int, max_sents: int,
                             int8: bool = False, mesh: Mesh | None = None,
                             q_chunk: int | None = None, blur: float = 0.05,
                             scaling: float = 0.9, temp: float = 1.0,
                             max_iters: int = 128, solver: str = "xla"):
    """Batched fused serving: B queries -> search + gather + rerank, one
    dispatch.  fn(q [B, qmax, d], q_lens i32[B], *bucket_arrays,
    doc_bucket, doc_row, doc_lens) -> (stage1 scores [B, k], doc_idx
    [B, k], ot_sims [B, k]).  See make_fused_query.  Under a mesh only the
    [B, k] score block psums over ICI.

    Memory: candidate gather + rerank run INSIDE a lax.map over queries, so
    only one query's [k, max_sents, dim] candidate block is live at a time
    -- a one-shot gather of the whole pool would be B*k*max_sents*dim f32
    (7+ GB at a 1000-query eval pool with k=100).  The rerank was already
    per-query (the annealing diameter must cover exactly one query's
    candidate pool to match the reference's per-query geomloss call -- a
    flat B*k solve would couple queries through the shared diameter); the
    gather just joins it in the map body.  Search -- the corpus-sized
    stage -- stays batched, with q_chunk bounding its [c, n, s, q]
    intermediate."""
    from .dense import (_unflatten_buckets, score_buckets_batched,
                        _merge_sharded_topk)

    per = 4 if int8 else 3
    axis = None if mesh is None else "shard"

    def _local(q, q_lens, *rest):
        flat, (db, dr, dl) = rest[:-3], rest[-3:]
        buckets = _unflatten_buckets(flat, n_buckets, int8)
        v, d = score_buckets_batched(buckets, q, q_lens, k, q_chunk)
        if mesh is not None:
            v, d = _merge_sharded_topk(v, d, k)

        def _one(xs):
            qi, ql, d_i = xs
            emb, cl, owned, valid = _gather_candidates(
                buckets, db, dr, dl, d_i, max_sents, axis_name=axis)
            diam = None
            if mesh is not None:
                diam = _mesh_pool_diameter(
                    qi[None], emb[None], owned[None], valid[None], axis)[0]
            qt = MultiVec(
                embed=jnp.broadcast_to(qi[None], (k,) + qi.shape),
                lens=jnp.broadcast_to(ql[None], (k,)))
            s, _ = wasserstein_dist(
                qt, MultiVec(embed=emb, lens=cl), blur=blur,
                scaling=scaling, temp=temp, return_pair_sims=True,
                max_iters=max_iters, solver=solver, diameter_value=diam)
            # zero the rows this shard doesn't own so the psum below
            # assembles each candidate's score exactly once
            return jnp.where(owned, s, 0.0) if mesh is not None else s

        sims = jax.lax.map(_one, (q.astype(jnp.float32),
                                  q_lens.astype(jnp.int32), d))
        if mesh is not None:
            sims = jax.lax.psum(sims, "shard")
        sims = jnp.where(d >= 0, sims, NEG)
        return -jnp.sqrt(jnp.maximum(-v, 0.0)), d, sims

    if mesh is None:
        return jax.jit(_local)
    in_specs = tuple([P(), P()] + [P("shard")] * (per * n_buckets)
                     + [P(), P(), P()])
    fn = shard_map(_local, mesh=mesh, in_specs=in_specs,
                   out_specs=(P(), P(), P()), check_vma=False)
    return jax.jit(fn)


def make_pool_rank_batched(n_buckets: int, pool_size: int, max_sents: int,
                           agg: str = "ot", int8: bool = False,
                           mesh: Mesh | None = None, blur: float = 0.05,
                           scaling: float = 0.9, temp: float = 1.0,
                           max_iters: int = 128, solver: str = "xla",
                           score_type: str = "l2"):
    """POOL-restricted ranking: score each query against exactly its
    candidate-pool ids, all pool members, no retrieval stage.

    The reference's primary evaluation protocol is pool RE-RANKING, not
    global retrieval: `caching_scoringmodel_rank_pool_sent` iterates
    qpid -> cand_pids and scores the full pool per query
    (pp_gen_nearest.py:241-283), and every rank_pool* variant takes the pool
    as input (:729-985).  This builder runs that protocol on the serving
    index: candidate reps are gathered ON DEVICE from the dense buckets by
    doc id and scored with the model's own aggregation in one jitted
    dispatch for the whole query set.

    fn(q [B, qmax, d], q_lens i32[B], cand_ids i32[B, P] (-1 = pad),
       *bucket_arrays, doc_bucket, doc_row, doc_lens) -> sims f32[B, P]
    (NEG at pad slots).  Extra args from DenseBucketIndex.device_arrays(mesh)
    + .device_pos_arrays(mesh).

    agg: 'ot' (otAspire Sinkhorn; diameter='pair' so scores are bit-equal to
    the evaluate path's per-pair scoring, evaluation/models.py _pair_scores),
    'l2max' (tsAspire single match), or 'cosine_max' (sent-family indexes --
    reps stored unit-normalized, scores returned as cosine = 1 - L2^2/2).
    The exact-precision scorers (ops.distances, HIGHEST contraction) run
    here: the pool scan IS the final ranking.

    mesh: each shard gathers + scores only the candidate rows it owns (docs
    never span shards), then one psum of the [B, P] score block crosses ICI.
    The per-pair annealing diameter is exact under sharding for free: the
    owner shard holds the candidate's full rows, and non-owner scores are
    zeroed before the psum.
    """
    from .dense import _unflatten_buckets

    per = 4 if int8 else 3
    axis = None if mesh is None else "shard"
    if agg == "cosine_max" and score_type != "cosine":
        raise ValueError("cosine_max pool scoring expects a --family sent "
                         "index (unit-normalized reps)")

    def _local(q, q_lens, cand_ids, *rest):
        flat, (db, dr, dl) = rest[:-3], rest[-3:]
        buckets = _unflatten_buckets(flat, n_buckets, int8)

        def _one(xs):
            qi, ql, cids = xs
            emb, cl, owned, valid = _gather_candidates(
                buckets, db, dr, dl, cids, max_sents, axis_name=axis)
            npool = cids.shape[0]
            qt = MultiVec(embed=jnp.broadcast_to(qi[None], (npool,) + qi.shape),
                          lens=jnp.broadcast_to(ql[None], (npool,)))
            cm = MultiVec(embed=emb, lens=cl)
            if agg == "ot":
                s, _ = wasserstein_dist(qt, cm, blur=blur, scaling=scaling,
                                        temp=temp, return_pair_sims=True,
                                        max_iters=max_iters, solver=solver,
                                        diameter="pair")
            elif agg in ("l2max", "cosine_max"):
                s, _ = l2max_dist(qt, cm, return_pair_sims=True)
                if agg == "cosine_max":
                    # unit vectors: cos = 1 - L2^2/2 (build stored unit rows)
                    s = 1.0 - s * s / 2.0
            elif agg == "jointsm":
                from ..ops.distances import jointsm_dist
                neg, _ = jointsm_dist(qt, cm, return_pair_sims=True)
                s = -neg   # poly-encoder returns the negated summed score
            else:
                raise ValueError(f"unknown pool agg {agg}")
            return jnp.where(owned, s, 0.0) if mesh is not None else s

        sims = jax.lax.map(_one, (q.astype(jnp.float32),
                                  q_lens.astype(jnp.int32), cand_ids))
        if mesh is not None:
            sims = jax.lax.psum(sims, "shard")
        return jnp.where(cand_ids >= 0, sims, NEG)

    if mesh is None:
        return jax.jit(_local)
    in_specs = tuple([P(), P(), P()] + [P("shard")] * (per * n_buckets)
                     + [P(), P(), P()])
    fn = shard_map(_local, mesh=mesh, in_specs=in_specs,
                   out_specs=P(), check_vma=False)
    return jax.jit(fn)


def make_cls_pool_rank_batched(mesh: Mesh | None = None):
    """Pool-restricted CLS ranking: -L2 of each query's CLS vector against
    exactly its candidate pool (reference rank_pool, pp_gen_nearest.py:
    638-726, which runs sklearn NN per pool).

    fn(q [B, d], cand_ids i32[B, P] (-1 = pad), reps [n_pad, d], norms
    [n_pad]) -> sims f32[B, P] = -||q - c|| (NEG at pads).  HIGHEST
    precision -- this IS the final ranking (index.cls._local_topk rationale).
    Under a mesh each shard scores the rows it owns; one [B, P] psum merges.
    """

    def _local(q, cand_ids, reps, norms):
        valid = cand_ids >= 0
        local_n = reps.shape[0]
        if mesh is None:
            rows = jnp.where(valid, cand_ids, 0)
            own = valid
        else:
            me = jax.lax.axis_index("shard")
            own = valid & (cand_ids // local_n == me)
            rows = jnp.where(own, cand_ids % local_n, 0)
        c = reps[rows]                                  # [B, P, d] storage
        cn = norms[rows]
        qf = q.astype(jnp.float32)
        qc = jnp.einsum("bd,bpd->bp", q.astype(reps.dtype), c,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.maximum(cn + jnp.sum(qf * qf, axis=1)[:, None] - 2.0 * qc,
                         0.0)
        s = -jnp.sqrt(d2)
        s = jnp.where(own, s, 0.0) if mesh is not None else s
        if mesh is not None:
            s = jax.lax.psum(s, "shard")
        return jnp.where(cand_ids >= 0, s, NEG)

    if mesh is None:
        return jax.jit(_local)
    fn = shard_map(_local, mesh=mesh,
                   in_specs=(P(), P(), P("shard"), P("shard")),
                   out_specs=P(), check_vma=False)
    return jax.jit(fn)


def sharded_l2max_search(index, mesh: Mesh, q_sents: np.ndarray,
                         q_len: int, k: int = 50):
    """Convenience one-shot sharded search from a host-side index."""
    sents, doc_ids = index.device_arrays(mesh)
    fn = make_sharded_search(mesh, index.n_docs, k)
    return fn(jnp.asarray(q_sents, jnp.float32), jnp.int32(q_len), sents, doc_ids)
