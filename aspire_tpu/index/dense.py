"""Dense-bucketed multi-vector index: the high-throughput serving layout.

Profiling on v5e showed the flat+segment-max layout (build.py/serve.py) runs
at ~115 GB/s effective -- the scatter kills it.  This layout removes every
scatter/gather from the hot path:

  * documents are grouped into SENTENCE-COUNT BUCKETS (max sents 4/8/12/...);
    each bucket is a dense [n_docs_b, s_b, dim] block (bf16 by default);
  * per-sentence squared norms are precomputed ([n_docs_b, s_b] f32, +inf at
    pad slots so pads never win a max);
  * l2max scoring per bucket is ONE einsum (2*q.x - |x|^2 on the MXU) + a
    max over (sentence, query) axes + per-bucket top-k; bucket results merge
    by a concat + global top-k.  ~550 GB/s effective on chip, ~4.8x the flat
    layout;
  * multi-chip: each bucket's doc axis is sharded over the `shard` mesh axis;
    per-shard top-k results merge with one all_gather of k-sized arrays over
    ICI (serve-side shard_map);
  * optional INT8 storage (dtype="int8"): sentence vectors quantized with a
    per-sentence symmetric scale (x ~= scale * x_i8), halving scan bytes vs
    bf16.  The kernel upcasts int8->bf16 inside the fused einsum (XLA fuses
    the convert into the matmul read -- no int8 MXU accumulation, which lost
    accuracy on this toolchain; see docs/design.md) and applies the scale to
    the [n, s, q] sims: 2*scale*(q.x_i8) - |x|^2 - |q|^2 with norms
    precomputed on the DEQUANTIZED stored values, so ordering is exact for
    what's in memory.  Scales add 4 bytes per sentence (~0.26% of bf16 row).

Squared-L2 ordering == L2 ordering; exposed scores are sqrt'd to match the
reference's -cdist values (pp_gen_nearest.py:729-985).
"""
from __future__ import annotations

import dataclasses
import json
import pathlib

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

NEG = -1e30

DEFAULT_BUCKETS = (4, 8, 12, 16, 20, 24)


@dataclasses.dataclass
class DenseBucketIndex:
    """Host-side dense-bucketed index."""

    buckets: list[dict]     # each: {"sents": [n,s,d], "norms": [n,s] f32,
                            #        "doc_idx": [n] i32,
                            #        optional "scales": [n,s] f32 (int8 mode)}
    doc_lens: np.ndarray    # [n_docs] i32 (true sentence counts)
    pids: list
    # 'l2' (aspire multi-vector reps) or 'cosine' (sent-bert family: reps
    # stored L2-NORMALIZED, so the same l2max search ranks identically to
    # cosine max-sim and rank-time scores convert via cos = 1 - L2^2/2)
    score_type: str = "l2"
    # inverse map doc -> (bucket, row), built once at build/load time so the
    # rerank candidate fetch is O(k) instead of O(n_docs) per query
    _doc_bucket: np.ndarray | None = None   # [n_docs] i32
    _doc_row: np.ndarray | None = None      # [n_docs] i32

    def _ensure_doc_pos(self) -> None:
        """Build the doc->(bucket, row) inverse map (vectorized, once)."""
        if self._doc_bucket is not None:
            return
        db = np.full((self.n_docs,), -1, np.int32)
        dr = np.zeros((self.n_docs,), np.int32)
        for bi, b in enumerate(self.buckets):
            di = b["doc_idx"]
            valid = di >= 0
            db[di[valid]] = bi
            dr[di[valid]] = np.nonzero(valid)[0].astype(np.int32)
        object.__setattr__(self, "_doc_bucket", db)
        object.__setattr__(self, "_doc_row", dr)

    @property
    def is_int8(self) -> bool:
        return "scales" in self.buckets[0]

    @property
    def n_docs(self) -> int:
        return len(self.pids)

    @property
    def dim(self) -> int:
        return self.buckets[0]["sents"].shape[-1]

    def save(self, path) -> None:
        path = pathlib.Path(path)
        path.mkdir(parents=True, exist_ok=True)
        # np.save round-trips bfloat16 as an opaque void dtype; store the raw
        # uint16 view and record the true dtype in meta.json instead.
        sent_dtype = str(np.dtype(self.buckets[0]["sents"].dtype))
        for i, b in enumerate(self.buckets):
            sents = b["sents"]
            if sents.dtype.itemsize == 2 and sents.dtype.kind == "V" or \
                    "bfloat16" in str(sents.dtype):
                sents = sents.view(np.uint16)
            np.save(path / f"bucket{i}_sents.npy", sents)
            np.save(path / f"bucket{i}_norms.npy", b["norms"])
            np.save(path / f"bucket{i}_docidx.npy", b["doc_idx"])
            if "scales" in b:
                np.save(path / f"bucket{i}_scales.npy", b["scales"])
        np.save(path / "doc_lens.npy", self.doc_lens)
        from .build import save_pids
        save_pids(path, self.pids)
        with open(path / "meta.json", "w") as f:
            json.dump({"n_buckets": len(self.buckets),
                       "sent_dtype": sent_dtype,
                       "score_type": self.score_type}, f)

    @classmethod
    def load(cls, path) -> "DenseBucketIndex":
        path = pathlib.Path(path)
        with open(path / "meta.json") as f:
            meta = json.load(f)
        nb = meta["n_buckets"]
        sent_dtype = meta.get("sent_dtype", "float32")

        def load_sents(i):
            arr = np.load(path / f"bucket{i}_sents.npy")
            if "bfloat16" in sent_dtype:
                import ml_dtypes
                arr = arr.view(ml_dtypes.bfloat16)
            return arr

        buckets = []
        for i in range(nb):
            b = {
                "sents": load_sents(i),
                "norms": np.load(path / f"bucket{i}_norms.npy"),
                "doc_idx": np.load(path / f"bucket{i}_docidx.npy"),
            }
            scales_path = path / f"bucket{i}_scales.npy"
            if scales_path.exists():
                b["scales"] = np.load(scales_path)
            buckets.append(b)
        from .build import load_pids
        pids = load_pids(path)
        idx = cls(buckets=buckets, doc_lens=np.load(path / "doc_lens.npy"),
                  pids=pids, score_type=meta.get("score_type", "l2"))
        idx._ensure_doc_pos()
        return idx

    def device_arrays(self, mesh: Mesh | None = None) -> list[dict]:
        """Place bucket arrays on device; doc axis sharded over `shard`."""
        out = []
        for b in self.buckets:
            if mesh is None:
                put = jnp.asarray
            else:
                # multi-process safe: under a multi-host serving job each
                # process holds the full host index and contributes only the
                # rows its devices own (parallel.mesh.place)
                from ..parallel.mesh import place
                put = lambda x: place(np.asarray(x), mesh, P("shard"))
            dev = {"sents": put(b["sents"]), "norms": put(b["norms"]),
                   "doc_idx": put(b["doc_idx"])}
            if "scales" in b:
                dev["scales"] = put(b["scales"])
            out.append(dev)
        return out

    def device_pos_arrays(self, mesh: Mesh | None = None) -> tuple:
        """Device copies of the doc->(bucket, row) inverse map + doc lens.

        Feeds the FUSED query path (index.serve.make_fused_query): candidate
        gathering happens on device, so serving pays zero host round trips
        between search and rerank.  Replicated under a serving mesh (the
        bucket arrays are the sharded part)."""
        self._ensure_doc_pos()
        arrs = (np.asarray(self._doc_bucket), np.asarray(self._doc_row),
                np.asarray(self.doc_lens, np.int32))
        if mesh is None:
            return tuple(jnp.asarray(a) for a in arrs)
        from ..parallel.mesh import place
        return tuple(place(a, mesh, P()) for a in arrs)

    def gather_doc_reps(self, doc_idx, max_sents: int):
        """Host-side gather of per-doc sentence reps for the rerank stage.

        O(k) per call via the precomputed doc->(bucket, row) inverse map --
        one fancy-indexed slice per bucket that holds candidates (the
        reference's equivalent fetch is a dict lookup over its flat rep
        matrix, pp_gen_nearest.py:207-363).
        """
        from ..core.types import MultiVec
        self._ensure_doc_pos()
        doc_idx = np.asarray(doc_idx, np.int64)
        k = len(doc_idx)
        # pad ids (-1, from _topk_padded when the pool < k) must yield zero
        # rows, NOT numpy's negative-index wraparound to the last real doc
        valid = doc_idx >= 0
        safe = np.where(valid, doc_idx, 0)
        out = np.zeros((k, max_sents, self.dim), np.float32)
        lens = np.where(valid, np.minimum(self.doc_lens[safe], max_sents),
                        0).astype(np.int32)
        cand_bucket = np.where(valid, self._doc_bucket[safe], -1)
        cand_row = self._doc_row[safe]
        for bi in np.unique(cand_bucket[valid]):
            b = self.buckets[bi]
            sel = np.nonzero(cand_bucket == bi)[0]
            s = min(b["sents"].shape[1], max_sents)
            reps = b["sents"][cand_row[sel], :s].astype(np.float32)
            if "scales" in b:  # dequantize int8 storage
                reps = reps * b["scales"][cand_row[sel], :s, None]
            # zero out pad slots past each doc's true length
            mask = (np.arange(s)[None, :] < lens[sel, None])
            out[sel, :s] = reps * mask[:, :, None]
        return MultiVec(embed=jnp.asarray(out), lens=jnp.asarray(lens))


def _assign_buckets(doc_lens: np.ndarray, buckets: tuple) -> dict:
    """doc index lists per bucket size (smallest bucket that fits)."""
    by_bucket: dict[int, list[int]] = {s: [] for s in buckets}
    for di, ln in enumerate(doc_lens):
        for s in buckets:
            if ln <= s:
                by_bucket[s].append(di)
                break
    return by_bucket


def build_dense_index(doc_reps: list[np.ndarray], pids: list,
                      buckets: tuple[int, ...] = DEFAULT_BUCKETS,
                      n_shards: int = 1, dtype=None,
                      score_type: str = "l2") -> DenseBucketIndex:
    """Pack per-doc [num_sents, dim] matrices into dense buckets.

    Docs longer than the largest bucket are truncated to it.  Each bucket's
    doc count is padded to a multiple of 8*n_shards (sublane/shard
    alignment) with dummy docs (doc_idx -1, norms +inf).

    dtype: bf16 (default), f32, or "int8"/np.int8 for per-sentence-scale
    symmetric quantization (halves scan bytes; see module docstring)."""
    import ml_dtypes
    if dtype is None:
        dtype = ml_dtypes.bfloat16
    if isinstance(dtype, str):
        int8 = dtype == "int8"
    else:
        int8 = np.dtype(dtype) == np.int8
    dim = doc_reps[0].shape[1]
    doc_lens = np.asarray([min(len(r), buckets[-1]) for r in doc_reps], np.int32)
    by_bucket = _assign_buckets(doc_lens, buckets)
    out_buckets = []
    align = 8 * n_shards
    for s in buckets:
        idxs = by_bucket[s]
        if not idxs:
            continue
        n = -(-len(idxs) // align) * align
        sents = np.zeros((n, s, dim), np.int8 if int8 else dtype)
        norms = np.full((n, s), np.float32(np.inf), np.float32)
        doc_idx = np.full((n,), -1, np.int32)
        scales = np.zeros((n, s), np.float32) if int8 else None
        # vectorized packing: one flat [sum(lens), dim] block per bucket --
        # per-doc python work is a slice + concat only (a per-doc math loop
        # took minutes at the 400k-doc capacity config)
        lens_b = np.minimum(doc_lens[idxs], s).astype(np.int64)
        flat_rows = np.concatenate(
            [np.asarray(doc_reps[di][:s], np.float32) for di in idxs], axis=0)
        row_of = np.repeat(np.arange(len(idxs)), lens_b)
        pos_of = np.arange(lens_b.sum()) - np.repeat(
            np.cumsum(lens_b) - lens_b, lens_b)
        # norms computed on the STORED (rounded/quantized) values so
        # 2*q.x - |x|^2 is exact for the stored vectors.  In-place ops and
        # the einsum keep the pass count low -- the host here is a single
        # (quota-throttled) core, and every extra full-array pass at the
        # 400k-doc capacity config costs real minutes.
        if int8:
            sc = np.abs(flat_rows).max(axis=1)
            sc /= 127.0                                       # per sentence
            sc = np.where(sc > 0, sc, 1.0).astype(np.float32)
            flat_rows /= sc[:, None]
            np.rint(flat_rows, out=flat_rows)
            np.clip(flat_rows, -127, 127, out=flat_rows)
            sents[row_of, pos_of] = flat_rows.astype(np.int8)
            scales[row_of, pos_of] = sc
            # |stored|^2 = sc^2 * sum(xi^2), no dequantized materialization
            norms[row_of, pos_of] = np.einsum(
                "ld,ld->l", flat_rows, flat_rows,
                dtype=np.float32) * (sc * sc)
        else:
            cast = flat_rows.astype(dtype)
            sents[row_of, pos_of] = cast
            if np.dtype(dtype) == np.float32:
                stored = cast
            else:
                stored = cast.astype(np.float32)
            norms[row_of, pos_of] = np.einsum("ld,ld->l", stored, stored)
        doc_idx[: len(idxs)] = idxs
        b = {"sents": sents, "norms": norms, "doc_idx": doc_idx}
        if int8:
            b["scales"] = scales
        out_buckets.append(b)
    idx = DenseBucketIndex(buckets=out_buckets, doc_lens=doc_lens,
                           pids=list(pids), score_type=score_type)
    idx._ensure_doc_pos()
    return idx


def build_dense_index_prequantized(doc_quant: list, pids: list,
                                   buckets: tuple[int, ...] = DEFAULT_BUCKETS,
                                   n_shards: int = 1) -> DenseBucketIndex:
    """Pack device-quantized int8 docs into a dense-bucket index.

    doc_quant: list of (xi int8 [len, d], scales f32 [len]) pairs, as
    produced on the VPU by AspireSimilarityModel.encode_quantized.
    Equivalent to build_dense_index(doc_reps, dtype='int8') applied to the
    same quantized values, but the host does PACKING ONLY: the quantization
    math ran on device and the norms come from an int32 squared-sum of the
    stored ints (|stored|^2 = sc^2 * sum(xi^2); max 768*127^2 < 2^31).
    This keeps the indexing pipeline off the (single-core) host critical
    path and downloads 1 byte/element from the encoder instead of 4.
    """
    dim = doc_quant[0][0].shape[1]
    doc_lens = np.asarray([min(len(x), buckets[-1]) for x, _ in doc_quant],
                          np.int32)
    by_bucket = _assign_buckets(doc_lens, buckets)
    out_buckets = []
    align = 8 * n_shards
    for s in buckets:
        idxs = by_bucket[s]
        if not idxs:
            continue
        n = -(-len(idxs) // align) * align
        sents = np.zeros((n, s, dim), np.int8)
        norms = np.full((n, s), np.float32(np.inf), np.float32)
        doc_idx = np.full((n,), -1, np.int32)
        scales = np.zeros((n, s), np.float32)
        lens_b = np.minimum(doc_lens[idxs], s).astype(np.int64)
        flat_xi = np.concatenate(
            [np.asarray(doc_quant[di][0][:s], np.int8) for di in idxs], axis=0)
        flat_sc = np.concatenate(
            [np.asarray(doc_quant[di][1][:s], np.float32) for di in idxs])
        row_of = np.repeat(np.arange(len(idxs)), lens_b)
        pos_of = np.arange(lens_b.sum()) - np.repeat(
            np.cumsum(lens_b) - lens_b, lens_b)
        sents[row_of, pos_of] = flat_xi
        scales[row_of, pos_of] = flat_sc
        sq = np.einsum("ld,ld->l", flat_xi, flat_xi, dtype=np.int32)
        norms[row_of, pos_of] = sq.astype(np.float32) * flat_sc * flat_sc
        doc_idx[: len(idxs)] = idxs
        out_buckets.append({"sents": sents, "norms": norms,
                            "doc_idx": doc_idx, "scales": scales})
    idx = DenseBucketIndex(buckets=out_buckets, doc_lens=doc_lens,
                           pids=list(pids))
    idx._ensure_doc_pos()
    return idx


def _bucket_sims(q, bucket, exact: bool = False):
    """Fused [n, s, q] similarity tensor q.x for one bucket.

    float storage: q is pre-cast to the bucket dtype by the caller.
    int8 storage: upcast int8->bf16 inside the einsum read (XLA fuses the
    convert; HBM traffic stays 1 byte/elem) and apply the per-sentence
    dequantization scale to the sims.

    exact=True runs the f32 contraction at Precision.HIGHEST.  Default
    precision rounds f32 MXU inputs to bf16 (ops/cdist.py audit), fine for
    the aspire first stage (exact rerank re-scores candidates) but NOT for
    index families whose scan is the final ranking (sent/cosine) -- there
    near-tie neighbour flips leak into results.  bf16/int8 storage is
    unaffected (inputs already bf16; HIGHEST is then a no-op)."""
    sents = bucket["sents"]
    prec = jax.lax.Precision.HIGHEST if exact else None
    if "scales" in bucket:
        sims = jnp.einsum("qd,nsd->nsq", q.astype(jnp.bfloat16),
                          sents.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        return sims * bucket["scales"][:, :, None]
    return jnp.einsum("qd,nsd->nsq", q.astype(sents.dtype), sents,
                      preferred_element_type=jnp.float32, precision=prec)


def _bucket_topk(q, q_norms, q_len, bucket, k: int, exact: bool = False):
    """One bucket: -> (top-k sq-l2max scores [k], global doc idx [k]).

    score(doc) = max over (sent, query-sent) of (2 q.x - |x|^2 - |q|^2)
    which orders identically to -L2 and equals its square up to sign."""
    norms, doc_idx = bucket["norms"], bucket["doc_idx"]
    sims = _bucket_sims(q, bucket, exact)
    qmask = (jnp.arange(q.shape[0], dtype=jnp.int32) < q_len)
    scores3 = 2.0 * sims - norms[:, :, None] - q_norms[None, None, :]
    scores3 = jnp.where(qmask[None, None, :], scores3, NEG)
    score = jnp.max(scores3, axis=(1, 2))
    score = jnp.where(doc_idx >= 0, score, NEG)
    kk = min(k, score.shape[0])
    v, i = jax.lax.top_k(score, kk)
    return v, doc_idx[i]


def _merge_sharded_topk(v, d, k: int, axis_name: str = "shard"):
    """Merge per-shard batched top-k blocks inside a shard_map body.

    v, d: [B, k] per shard -> replicated [B, k]: one all_gather of the
    k-sized blocks over ICI, then a re-top-k of the n_shards*k pool per
    query.  Shared by the plain, batched, and fused search builders (their
    'sharded == single-device' parity tests all ride this one merge)."""
    v_all = jax.lax.all_gather(v, axis_name)           # [n_shards, B, k]
    d_all = jax.lax.all_gather(d, axis_name)
    bsz = v.shape[0]
    v_all = jnp.moveaxis(v_all, 0, 1).reshape(bsz, -1)
    d_all = jnp.moveaxis(d_all, 0, 1).reshape(bsz, -1)
    vk, pos = jax.lax.top_k(v_all, k)
    return vk, jnp.take_along_axis(d_all, pos, axis=1)


def _topk_padded(v, d, k: int):
    """top_k over the last axis, padding the candidate pool with NEG/-1 when
    it holds fewer than k entries (tiny shards/buckets)."""
    m = v.shape[-1]
    if m < k:
        pad = [(0, 0)] * (v.ndim - 1) + [(0, k - m)]
        v = jnp.pad(v, pad, constant_values=NEG)
        d = jnp.pad(d, pad, constant_values=-1)
    vk, ik = jax.lax.top_k(v, k)
    return vk, jnp.take_along_axis(d, ik, axis=-1)


def _unflatten_buckets(flat, n_buckets: int, int8: bool) -> list[dict]:
    per = 4 if int8 else 3
    keys = ("sents", "norms", "doc_idx", "scales")[:per]
    return [dict(zip(keys, flat[per * i: per * (i + 1)]))
            for i in range(n_buckets)]


def score_buckets(buckets: list[dict], q, q_len, k: int,
                  exact: bool = False):
    """Top-k l2max doc scores over a list of (device) bucket dicts.

    q: f32[qmax, d]; -> (sq-l2max scores [k], global doc idx [k]).
    Shared by the plain/batched/fused search builders; usable inside jit
    and inside shard_map bodies (buckets then hold block-local views).
    exact: see _bucket_sims (HIGHEST-precision scan for cosine indexes)."""
    q = q.astype(jnp.float32)
    q_norms = jnp.sum(q * q, axis=1)
    vs, ds = [], []
    for b in buckets:
        v, d = _bucket_topk(q, q_norms, q_len, b, k, exact)
        vs.append(v)
        ds.append(d)
    return _topk_padded(jnp.concatenate(vs), jnp.concatenate(ds), k)


def make_dense_search(n_buckets: int, k: int, mesh: Mesh | None = None,
                      int8: bool = False, exact: bool = False):
    """Build the jitted search fn over device bucket arrays.

    Returns fn(q [qmax, d], q_len, *bucket_arrays) -> (scores [k], doc_idx [k])
    with scores = -sqrt(max(-sq_score, 0)) matching reference -L2 values.
    Single-chip (mesh=None) or sharded (per-shard top-k + all_gather merge).
    int8=True for an index built with dtype="int8" (4 arrays per bucket).
    exact=True for indexes whose scan IS the final ranking (score_type
    "cosine"): HIGHEST-precision f32 contraction, see _bucket_sims.
    """

    def _score_local(q, q_len, *flat):
        buckets = _unflatten_buckets(flat, n_buckets, int8)
        return score_buckets(buckets, q, q_len, k, exact)

    def _finish(v, d):
        return -jnp.sqrt(jnp.maximum(-v, 0.0)), d

    if mesh is None:
        @jax.jit
        def search(q, q_len, *flat):
            v, d = _score_local(q, q_len, *flat)
            return _finish(v, d)
        return search

    def _sharded(q, q_len, *flat):
        v, d = _score_local(q, q_len, *flat)
        vk, dk = _merge_sharded_topk(v[None], d[None], k)
        return _finish(vk[0], dk[0])

    per = 4 if int8 else 3
    in_specs = [P(), P()] + [P("shard")] * (per * n_buckets)
    fn = shard_map(_sharded, mesh=mesh, in_specs=tuple(in_specs),
                   out_specs=(P(), P()), check_vma=False)
    return jax.jit(fn)


def flatten_device_buckets(device_buckets: list[dict]) -> list:
    flat = []
    for b in device_buckets:
        flat.extend([b["sents"], b["norms"], b["doc_idx"]])
        if "scales" in b:
            flat.append(b["scales"])
    return flat


def _bucket_topk_batched(q, q_norms, q_lens, bucket, k: int,
                         exact: bool = False):
    """q: [B, Qmax, d]; -> (scores [B, k], doc idx [B, k]) for one bucket.
    exact: HIGHEST-precision f32 contraction, see _bucket_sims."""
    sents, norms, doc_idx = bucket["sents"], bucket["norms"], bucket["doc_idx"]
    bq, qmax, d = q.shape
    if "scales" in bucket:
        sims = jnp.einsum("bqd,nsd->bnsq", q.astype(jnp.bfloat16),
                          sents.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        sims = sims * bucket["scales"][None, :, :, None]
    else:
        sims = jnp.einsum(
            "bqd,nsd->bnsq", q.astype(sents.dtype), sents,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST if exact else None)
    qmask = (jnp.arange(qmax, dtype=jnp.int32)[None, :] < q_lens[:, None])
    scores4 = 2.0 * sims - norms[None, :, :, None] - q_norms[:, None, None, :]
    scores4 = jnp.where(qmask[:, None, None, :], scores4, NEG)
    score = jnp.max(scores4, axis=(2, 3))                      # [B, n]
    score = jnp.where(doc_idx[None, :] >= 0, score, NEG)
    kk = min(k, score.shape[1])
    v, i = jax.lax.top_k(score, kk)
    return v, doc_idx[i]


def score_buckets_batched(buckets: list[dict], q, q_lens, k: int,
                          q_chunk: int | None = None, exact: bool = False):
    """Batched-query top-k over device bucket dicts (see score_buckets).

    q: [B, Qmax, d]; q_lens: i32[B]; -> (scores [B, k], doc idx [B, k]).
    q_chunk bounds the [c, n, s, q] similarity intermediate (must divide B).
    """
    def _chunk(qc, qlc):
        qf = qc.astype(jnp.float32)
        q_norms = jnp.sum(qf * qf, axis=2)
        vs, ds = [], []
        for b in buckets:
            v, dd = _bucket_topk_batched(qc, q_norms, qlc, b, k, exact)
            vs.append(v)
            ds.append(dd)
        return _topk_padded(jnp.concatenate(vs, axis=1),
                            jnp.concatenate(ds, axis=1), k)

    bsz = q.shape[0]
    if q_chunk is None or q_chunk >= bsz:
        return _chunk(q, q_lens)
    assert bsz % q_chunk == 0, (
        f"q_chunk={q_chunk} must divide the query batch {bsz}")
    qr = q.reshape(bsz // q_chunk, q_chunk, *q.shape[1:])
    qlr = q_lens.reshape(bsz // q_chunk, q_chunk)
    vk, ik = jax.lax.map(lambda xs: _chunk(*xs), (qr, qlr))
    return vk.reshape(bsz, k), ik.reshape(bsz, k)


def make_dense_search_batched(n_buckets: int, k: int, int8: bool = False,
                              mesh: Mesh | None = None,
                              q_chunk: int | None = None,
                              exact: bool = False):
    """Batched-query variant: amortizes the corpus read over a whole query
    batch -- the production serving shape.

    Returns fn(q [B, Qmax, d], q_lens [B] i32, *bucket_arrays)
      -> (scores [B, k], doc_idx [B, k]), identical per-query results to
      make_dense_search.

    mesh: shard the corpus scan over the mesh's `shard` axis (per-shard
      batched top-k + one all_gather of [B, k] blocks over ICI, exactly the
      single-query merge widened by the batch axis).  Queries are replicated.

    q_chunk: bound the [c, n_docs_b, s, q] f32 similarity intermediate by
      scanning the query batch in chunks of c (lax.map).  At the production
      shape (B=32, 131k-doc bucket, s=8, q=16) the unchunked intermediate is
      ~2.1 GB; q_chunk=8 holds it at ~0.5 GB with the corpus still read once
      per chunk.  Must divide B.
    """

    def _score_local(q, q_lens, *flat):
        buckets = _unflatten_buckets(flat, n_buckets, int8)
        return score_buckets_batched(buckets, q, q_lens, k, q_chunk, exact)

    def _finish(v, d):
        return -jnp.sqrt(jnp.maximum(-v, 0.0)), d

    if mesh is None:
        @jax.jit
        def search(q, q_lens, *flat):
            return _finish(*_score_local(q, q_lens, *flat))
        return search

    def _sharded(q, q_lens, *flat):
        v, d = _score_local(q, q_lens, *flat)          # [B, k] per shard
        return _finish(*_merge_sharded_topk(v, d, k))

    per = 4 if int8 else 3
    in_specs = [P(), P()] + [P("shard")] * (per * n_buckets)
    fn = shard_map(_sharded, mesh=mesh, in_specs=tuple(in_specs),
                   out_specs=(P(), P()), check_vma=False)
    return jax.jit(fn)
