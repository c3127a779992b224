"""Whole-abstract (CLS) dense retrieval.

The bi-encoder models (cospecter/specter) rank with a single CLS vector per
document; the reference does this with sklearn brute NearestNeighbors on
host numpy (pp_gen_nearest.py:638-726).  Here: one [1, d] x [d, n] matmul +
top-k on device, sharded over the `shard` mesh axis with an all_gather merge.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


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


@partial(jax.jit, static_argnames=("k",))
def cls_search(q: jax.Array, reps: jax.Array, norms: jax.Array, k: int):
    """-L2 top-k for one query CLS vector. q: [d]; reps: [n, d]."""
    qf = q.astype(jnp.float32)
    sims = jnp.einsum("d,nd->n", q.astype(reps.dtype), reps,
                      preferred_element_type=jnp.float32)
    score = 2.0 * sims - norms - jnp.sum(qf * qf)
    v, i = jax.lax.top_k(score, k)
    # pad rows (+inf norms) score -inf: mark them -1 like the dense path so
    # k > n_docs can't surface a pad row as a plausible doc index
    i = jnp.where(jnp.isneginf(v), -1, i)
    return -jnp.sqrt(jnp.maximum(-v, 0.0)), i


def make_sharded_cls_search(mesh: Mesh, k: int):
    """reps/norms sharded on axis 0; returns replicated (scores, global idx)."""

    def _local(q, reps, norms):
        qf = q.astype(jnp.float32)
        sims = jnp.einsum("d,nd->n", q.astype(reps.dtype), reps,
                          preferred_element_type=jnp.float32)
        score = 2.0 * sims - norms - jnp.sum(qf * qf)
        v, i = jax.lax.top_k(score, k)
        # local row -> global row
        shard_id = jax.lax.axis_index("shard")
        i = i + shard_id * reps.shape[0]
        v_all = jax.lax.all_gather(v, "shard").reshape(-1)
        i_all = jax.lax.all_gather(i, "shard").reshape(-1)
        vk, ik = jax.lax.top_k(v_all, k)
        idx = jnp.where(jnp.isneginf(vk), -1, i_all[ik])  # pad sentinel
        return -jnp.sqrt(jnp.maximum(-vk, 0.0)), idx

    fn = shard_map(_local, mesh=mesh,
                   in_specs=(P(), P("shard"), P("shard")),
                   out_specs=(P(), P()), check_vma=False)
    return jax.jit(fn)
