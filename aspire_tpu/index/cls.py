"""Whole-abstract (CLS) dense retrieval.

The bi-encoder models (cospecter/specter) rank with a single CLS vector per
document; the reference does this with sklearn brute NearestNeighbors on
host numpy (pp_gen_nearest.py:638-726).  Here: one [B, d] x [d, n] matmul +
top-k on device, sharded over the `shard` mesh axis with an all_gather merge.

`ClsIndex` persists a corpus of CLS reps with the same file contract as the
multi-vector indexes (npy blocks + pids.json/pid2idx.json) so `build-index
--family cls` / `rank` serve bi-encoder corpora end-to-end.
"""
from __future__ import annotations

import dataclasses
import json
import pathlib
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .build import save_pids, load_pids
from .dense import _merge_sharded_topk, _topk_padded


def pack_cls_index(cls_reps: np.ndarray, n_shards: int = 1, dtype=None):
    """[n, d] float reps -> (reps [n_pad, d] dtype, norms [n_pad] f32).

    Pads with +inf-norm dummy rows so they never rank."""
    import ml_dtypes
    if dtype is None:
        dtype = ml_dtypes.bfloat16
    n, d = cls_reps.shape
    n_pad = -(-n // (128 * n_shards)) * (128 * n_shards)
    reps = np.zeros((n_pad, d), dtype)
    reps[:n] = cls_reps.astype(dtype)
    norms = np.full((n_pad,), np.float32(np.inf), np.float32)
    stored = reps[:n].astype(np.float32)
    norms[:n] = np.einsum("nd,nd->n", stored, stored)
    return reps, norms


def _local_topk(q: jax.Array, reps: jax.Array, norms: jax.Array, k: int):
    """[B, d] queries x [L, d] local reps -> pad-aware top-k of the
    neg-squared-L2 scores: ([B, k] scores, [B, k] local row ids, -1 where
    the local pool holds fewer than k rows)."""
    qf = q.astype(jnp.float32)
    # HIGHEST precision: this top-k IS the final CLS ranking (no rerank
    # stage shields it, unlike the multi-vector first-stage scan), and the
    # MXU's default f32->bf16 input rounding measurably flips near-tie
    # neighbours vs the reference's exact sklearn NN (seen on v5e).  For
    # bf16-stored indexes the inputs are already bf16, so HIGHEST costs
    # nothing there.
    sims = jnp.einsum("bd,nd->bn", q.astype(reps.dtype), reps,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    score = 2.0 * sims - norms[None, :] - jnp.sum(qf * qf, axis=1)[:, None]
    idx = jnp.broadcast_to(jnp.arange(score.shape[1], dtype=jnp.int32),
                           score.shape)
    return _topk_padded(score, idx, k)


def _finish(v: jax.Array, i: jax.Array):
    """neg-sq-L2 -> -L2 scores; pad slots (+inf-norm rows score -inf, short
    pools carry -1 from _topk_padded) come back as doc index -1."""
    idx = jnp.where(jnp.isneginf(v) | (i < 0), -1, i)
    return -jnp.sqrt(jnp.maximum(-v, 0.0)), idx


def make_cls_search_batched(k: int, mesh: Mesh | None = None,
                            q_chunk: int | None = None):
    """Batched CLS search: fn(q [B, d], reps [n_pad, d], norms [n_pad]) ->
    (scores [B, k], doc idx [B, k]; -1 at pad slots).

    The ONE CLS search implementation -- `cls_search` and
    `make_sharded_cls_search` are B=1 wrappers of this path, so the
    score/top-k/pad-sentinel logic lives in exactly one place.

    mesh: reps/norms sharded over `shard` on axis 0 (row = global doc
    index; ClsIndex pads to a 128-multiple so any mesh up to 128 ways
    divides it); per-shard top-k + one all_gather of [B, k] blocks merges
    over ICI (dense._merge_sharded_topk, the same merge the multi-vector
    paths ride).  Pad slots are dedicated +inf-norm ROWS and short
    shards/pools pad with -1 (`_topk_padded`), so ANY k is safe -- k larger
    than the per-shard row count or the whole corpus returns -1 fillers,
    never a duplicate or phantom doc.

    q_chunk: bound the [c, rows] f32 score intermediate by scanning the
    query batch in chunks of c (lax.map; must divide B) -- the CLS analogue
    of the dense path's q_chunk.
    """

    def _core(q, reps, norms, sharded: bool):
        def chunk_fn(qc):
            v, i = _local_topk(qc, reps, norms, k)
            if sharded:
                i = jnp.where(
                    i >= 0,
                    i + jax.lax.axis_index("shard") * reps.shape[0], -1)
                v, i = _merge_sharded_topk(v, i, k)
            return v, i

        bsz = q.shape[0]
        if q_chunk is None or q_chunk >= bsz:
            return _finish(*chunk_fn(q))
        assert bsz % q_chunk == 0, (
            f"q_chunk={q_chunk} must divide the query batch {bsz}")
        qr = q.reshape(bsz // q_chunk, q_chunk, q.shape[1])
        v, i = jax.lax.map(chunk_fn, qr)
        return _finish(v.reshape(bsz, k), i.reshape(bsz, k))

    if mesh is None:
        return jax.jit(lambda q, reps, norms: _core(q, reps, norms, False))
    fn = shard_map(lambda q, reps, norms: _core(q, reps, norms, True),
                   mesh=mesh, in_specs=(P(), P("shard"), P("shard")),
                   out_specs=(P(), P()), check_vma=False)
    return jax.jit(fn)


@partial(jax.jit, static_argnames=("k",))
def cls_search(q: jax.Array, reps: jax.Array, norms: jax.Array, k: int):
    """-L2 top-k for ONE query CLS vector (B=1 of the batched path).
    q: [d]; reps: [n, d]."""
    v, i = _finish(*_local_topk(q[None], reps, norms, k))
    return v[0], i[0]


@dataclasses.dataclass
class ClsIndex:
    """Host-side CLS-rep corpus index (one vector per document).

    Serves the reference's bi-encoder ranking corpora
    (pp_gen_nearest.py:638-726) with the multi-vector indexes' persistence
    contract.  Row = global doc index; +inf-norm pad rows at the tail never
    rank.  The row count pads to a 128-multiple, so the SERVING shard count
    is chosen at load time (any mesh whose size divides it), like the dense
    buckets.
    """

    reps: np.ndarray     # [n_pad, d] storage dtype
    norms: np.ndarray    # [n_pad] f32; +inf on pad rows
    pids: list

    @property
    def n_docs(self) -> int:
        return len(self.pids)

    @property
    def dim(self) -> int:
        return self.reps.shape[-1]

    def save(self, path: str | pathlib.Path) -> None:
        path = pathlib.Path(path)
        path.mkdir(parents=True, exist_ok=True)
        reps = self.reps
        meta = {"index_type": "cls", "rep_dtype": str(np.dtype(reps.dtype))}
        if "bfloat16" in meta["rep_dtype"]:
            reps = reps.view(np.uint16)   # np.save voids bfloat16
        np.save(path / "cls_reps.npy", reps)
        np.save(path / "cls_norms.npy", self.norms)
        save_pids(path, self.pids)
        with open(path / "meta.json", "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, path: str | pathlib.Path) -> "ClsIndex":
        path = pathlib.Path(path)
        with open(path / "meta.json") as f:
            meta = json.load(f)
        reps = np.load(path / "cls_reps.npy")
        if "bfloat16" in meta.get("rep_dtype", ""):
            import ml_dtypes
            reps = reps.view(ml_dtypes.bfloat16)
        return cls(reps=reps, norms=np.load(path / "cls_norms.npy"),
                   pids=load_pids(path))

    def device_arrays(self, mesh: Mesh | None = None):
        """(reps, norms) on the serving mesh, sharded over axis 0."""
        if mesh is None:
            put = jnp.asarray
        else:
            from ..parallel.mesh import place
            put = lambda x: place(x, mesh, P("shard"))   # multi-process safe
        return put(self.reps), put(self.norms)


def build_cls_index(cls_reps: np.ndarray, pids: list,
                    dtype=None) -> ClsIndex:
    """[n, d] CLS reps -> persisted/servable ClsIndex (default bf16 storage;
    norms always f32 from the stored values so search scores match what the
    storage dtype can express).  Rows pad to a 128-multiple -- the serving
    shard count is a load-time choice, not a build parameter."""
    assert len(cls_reps) == len(pids)
    reps, norms = pack_cls_index(np.asarray(cls_reps), n_shards=1,
                                 dtype=dtype)
    return ClsIndex(reps=reps, norms=norms, pids=list(pids))


def make_sharded_cls_search(mesh: Mesh, k: int):
    """Single-query sharded CLS search (B=1 of make_cls_search_batched)."""
    search = make_cls_search_batched(k, mesh=mesh)

    def fn(q, reps, norms):
        v, i = search(q[None], reps, norms)
        return v[0], i[0]

    return fn
