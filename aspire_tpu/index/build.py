"""Sharded multi-vector corpus index: build + storage.

The reference materializes corpus representations as one dense npy +
`pid2idx-*.json` (src/pre_process/pre_proc_buildreps.py:309-439) and ranks
with host numpy (pp_gen_nearest.py:729-985).  The TPU-native index instead
keeps the whole corpus resident in device HBM:

  layout: flat [total_sents, dim] sentence matrix (optionally bf16), plus
  int32 [total_sents] doc-id labels and per-doc lengths.  For an N-device
  serving mesh the *documents* are partitioned contiguously into N equal
  sentence-count shards (sentences of one doc never straddle shards), each
  shard padded to a common size, giving a [n_shards * shard_len, dim] array
  sharded over the `shard` mesh axis.

Query scoring then becomes one [q_sents, dim] x [dim, shard_len] matmul per
device + a segment-max + local top-k + all-gather merge (serve.py).
"""
from __future__ import annotations

import dataclasses
import json
import pathlib

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def save_pids(path: pathlib.Path, pids: list) -> None:
    """Persist the doc-idx -> paper-id map (shared by both index types).

    pid2idx.json keeps the reference file contract
    (pre_proc_buildreps.py:309-439), but JSON object KEYS are always
    strings -- integer paper ids would silently load back as strings and
    miss every gold-pool lookup.  The ordered pids.json list preserves
    types and is preferred on load."""
    with open(path / "pid2idx.json", "w") as f:
        json.dump({pid: i for i, pid in enumerate(pids)}, f)
    with open(path / "pids.json", "w") as f:
        json.dump(list(pids), f)


def load_pids(path: pathlib.Path) -> list:
    """Inverse of save_pids; falls back to pid2idx.json for old indexes."""
    pids_path = path / "pids.json"
    if pids_path.exists():
        with open(pids_path) as f:
            return json.load(f)
    with open(path / "pid2idx.json") as f:
        pid2idx = json.load(f)
    pids = [None] * len(pid2idx)
    for pid, i in pid2idx.items():
        pids[i] = pid
    return pids


@dataclasses.dataclass
class MultiVecIndex:
    """Host-side index representation (device placement via `shard`)."""

    sents: np.ndarray       # [n_shards, shard_len, dim]
    doc_ids: np.ndarray     # [n_shards, shard_len] int32; -1 on padding
    doc_lens: np.ndarray    # [n_docs] int32
    pids: list              # doc idx -> external paper id
    dtype: np.dtype = np.float32

    @property
    def n_docs(self) -> int:
        return len(self.pids)

    @property
    def n_shards(self) -> int:
        return self.sents.shape[0]

    @property
    def dim(self) -> int:
        return self.sents.shape[-1]

    # -- persistence (generalizes the npy + pid2idx contract) --
    def save(self, path: str | pathlib.Path) -> None:
        path = pathlib.Path(path)
        path.mkdir(parents=True, exist_ok=True)
        sents = self.sents
        meta = {"sent_dtype": str(np.dtype(sents.dtype))}
        if "bfloat16" in meta["sent_dtype"]:
            # np.save round-trips bfloat16 as an opaque void dtype
            sents = sents.view(np.uint16)
        np.save(path / "sents.npy", sents)
        np.save(path / "doc_ids.npy", self.doc_ids)
        np.save(path / "doc_lens.npy", self.doc_lens)
        save_pids(path, self.pids)
        with open(path / "meta.json", "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, path: str | pathlib.Path) -> "MultiVecIndex":
        path = pathlib.Path(path)
        sents = np.load(path / "sents.npy")
        meta_path = path / "meta.json"
        if meta_path.exists():
            with open(meta_path) as f:
                meta = json.load(f)
            if "bfloat16" in meta.get("sent_dtype", ""):
                import ml_dtypes
                sents = sents.view(ml_dtypes.bfloat16)
        pids = load_pids(path)
        return cls(sents=sents, doc_ids=np.load(path / "doc_ids.npy"),
                   doc_lens=np.load(path / "doc_lens.npy"), pids=pids,
                   dtype=sents.dtype)

    # -- device placement --
    def device_arrays(self, mesh: Mesh | None = None):
        """Place (sents, doc_ids) on the serving mesh, sharded on axis 0."""
        if mesh is None:
            sh = None
            put = lambda x: jnp.asarray(x)
        else:
            sh = NamedSharding(mesh, P("shard"))
            put = lambda x: jax.device_put(x, sh)
        return put(self.sents), put(self.doc_ids)


def build_index_from_reps(doc_reps: list[np.ndarray], pids: list,
                          n_shards: int = 1, dtype=np.float32) -> MultiVecIndex:
    """Assemble an index from per-doc [num_sents, dim] sentence matrices.

    Documents are greedily packed into `n_shards` contiguous shards balanced
    by sentence count; shards pad to a common length with zero vectors and
    doc_id -1 (zero reps at L2 distance ~|q| never win the max against real
    sentences, and -1 labels are dropped by the segment reduction).
    """
    assert len(doc_reps) == len(pids)
    doc_lens = np.asarray([r.shape[0] for r in doc_reps], np.int32)
    dim = doc_reps[0].shape[1]
    total = int(doc_lens.sum())

    shards: list[list[int]] = [[] for _ in range(n_shards)]
    shard_fill = np.zeros(n_shards, np.int64)
    si = 0
    remaining = total
    for di, ln in enumerate(doc_lens):
        # adaptive target (remaining work over remaining shards) and never
        # advance off an EMPTY shard: one oversized doc must not strand
        # empty shards behind OR after it -- every shard pads to the max
        # fill, so an empty shard inflates memory/scan work for all of them
        target = -(-remaining // (n_shards - si))
        if shard_fill[si] > 0 and shard_fill[si] + ln > target \
                and si < n_shards - 1:
            si += 1
        shards[si].append(di)
        shard_fill[si] += int(ln)
        remaining -= int(ln)

    shard_len = int(max(shard_fill.max(), 1))
    # round up to a lane-friendly multiple
    shard_len = -(-shard_len // 128) * 128
    sents = np.zeros((n_shards, shard_len, dim), dtype)
    doc_ids = np.full((n_shards, shard_len), -1, np.int32)
    for si, doc_idxs in enumerate(shards):
        off = 0
        for di in doc_idxs:
            ln = int(doc_lens[di])
            sents[si, off:off + ln] = doc_reps[di].astype(dtype)
            doc_ids[si, off:off + ln] = di
            off += ln
    return MultiVecIndex(sents=sents, doc_ids=doc_ids, doc_lens=doc_lens,
                         pids=list(pids), dtype=np.dtype(dtype))


def encode_corpus(model, params, corpus: list[dict], tokenizer,
                  batch_size: int = 32, seq_len: int = 512,
                  max_sents: int = 24) -> tuple[list[np.ndarray], np.ndarray]:
    """Stream a corpus of {'TITLE', 'ABSTRACT'} docs through the encoder.

    Returns (per-doc [num_sents, dim] float32 arrays, [n_docs, dim] CLS reps).
    Batches are fixed-shape so the encoder compiles once.
    """
    from ..text.tokenize import prepare_abstracts

    # params as a jit argument, not a closure constant (closure params bake
    # the full model into the HLO -- see evaluation/models.py)
    @jax.jit
    def _encode_p(p, feats):
        cls, mv = model.encode(p, feats)
        if mv is None:
            # CLS-only families (cospecter / sent models) return no
            # sentence reps: one zero row per doc keeps the return contract
            b = cls.shape[0]
            return cls, jnp.zeros((b, 1, cls.shape[-1]), cls.dtype), \
                jnp.zeros((b,), jnp.int32)
        return cls, mv.embed, mv.lens

    _encode = lambda feats: _encode_p(params, feats)

    doc_reps: list[np.ndarray] = []
    cls_reps: list[np.ndarray] = []
    for start in range(0, len(corpus), batch_size):
        chunk = corpus[start:start + batch_size]
        pad_n = batch_size - len(chunk)
        fb = prepare_abstracts(chunk + [chunk[-1]] * pad_n, tokenizer,
                               max_sents=max_sents, seq_len=seq_len)
        feats = {"token_ids": jnp.asarray(fb.token_ids),
                 "attn_mask": jnp.asarray(fb.attn_mask),
                 "sent_ids": jnp.asarray(fb.sent_ids),
                 "abs_lens": jnp.asarray(fb.abs_lens)}
        cls, embed, lens = jax.device_get(_encode(feats))
        for i in range(len(chunk)):
            doc_reps.append(np.asarray(embed[i, : int(lens[i])], np.float32))
            cls_reps.append(np.asarray(cls[i], np.float32))
    return doc_reps, np.stack(cls_reps) if cls_reps else np.zeros((0, 0))
