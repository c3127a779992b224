"""Deep-pool scoring benchmark: TRECCOVID-RF-shaped pools (1-2k cands/query).

The reference's deepest pools are TRECCOVID-RF's (up to ~2k candidates per
query); it handles them by precomputing one giant query x corpus numpy
similarity matrix on host (rank_pool_sent_treccovid,
pp_gen_nearest.py:782-795).  This benchmark measures the TPU replacements:

  * serving pool path (index.serve.make_pool_rank_batched): on-device
    candidate gather from the dense buckets + per-pool scoring (l2max or
    Sinkhorn OT with per-pair annealing) in one jitted dispatch;
  * evaluate-path SCORE_CHUNKS ladder (evaluation/models.py:341-367): the
    per-chunk wasserstein_dist(diameter='pair') program at the 1024-pair
    ladder shape -- a pool of P costs ceil(P/1024) chunk dispatches.

Corpus reps are generated ON DEVICE (host->device transfers ride the
network tunnel here) as one dense bucket; the gather/scoring cost does not
depend on rep values.

Run: python benchmarks/pool_bench.py [--n-docs 100000] [--pool 2048]
         [--batch 8] [--solver pallas|xla]
"""
import argparse
import json
import pathlib
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).parent))
from timing import timed_loop

from aspire_tpu.core.types import MultiVec
from aspire_tpu.index.serve import make_pool_rank_batched
from aspire_tpu.ops.distances import wasserstein_dist, l2max_dist

DIM = 768


def synth_bucket(key, n_docs: int, s: int):
    """One dense bucket + pos arrays, entirely on device (bf16 storage)."""
    sents = jax.random.normal(key, (n_docs, s, DIM), jnp.bfloat16)
    norms = jnp.einsum("nsd,nsd->ns", sents, sents,
                       preferred_element_type=jnp.float32)
    doc_idx = jnp.arange(n_docs, dtype=jnp.int32)
    doc_bucket = jnp.zeros((n_docs,), jnp.int32)
    doc_row = jnp.arange(n_docs, dtype=jnp.int32)
    doc_lens = jnp.full((n_docs,), s, jnp.int32)
    flat = (sents, norms, doc_idx)
    pos = (doc_bucket, doc_row, doc_lens)
    return flat, pos


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=100_000)
    ap.add_argument("--pool", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--sents", type=int, default=12)
    ap.add_argument("--max-sents", type=int, default=24)
    ap.add_argument("--qmax", type=int, default=16)
    # enough in-jit repetitions that the loop dwarfs the ~25 ms tunnel RTT
    # (a 1024-pair OT chunk is ~0.5 ms: at 4 iters the whole loop hides
    # under the RTT and the row reads 0.0 -- measured the hard way)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--solver", choices=["pallas", "xla"], default="pallas")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from aspire_tpu.train.trainer import enable_compilation_cache
    enable_compilation_cache()

    keys = jax.random.split(jax.random.key(0), 4)
    flat, pos = synth_bucket(keys[0], args.n_docs, args.sents)
    B, P = args.batch, args.pool
    q = jax.random.normal(keys[1], (B, args.qmax, DIM), jnp.float32)
    q_lens = jnp.full((B,), args.qmax, jnp.int32)
    cand_ids = jax.random.randint(keys[2], (B, P), 0, args.n_docs, jnp.int32)

    rows = []
    for agg in ("l2max", "ot"):
        fn = make_pool_rank_batched(
            1, pool_size=P, max_sents=args.max_sents, agg=agg,
            temp=5000.0, solver=args.solver if agg == "ot" else "xla")

        def body(acc, q, q_lens, cand_ids, *rest):
            sims = fn(q + acc * 0.0, q_lens, cand_ids, *rest)
            return jnp.sum(jnp.where(sims > -1e29, sims, 0.0))

        dt = timed_loop(body, args.iters, q, q_lens, cand_ids, *flat, *pos)
        rows.append({
            "metric": f"pool_rank_{agg}", "path": "serving-pool",
            "n_docs": args.n_docs, "pool": P, "batch": B,
            "solver": args.solver if agg == "ot" else "n/a",
            "ms_per_query": round(dt / B * 1e3, 3),
            "queries_per_sec": round(B / dt, 1),
            "pairs_per_sec": round(B * P / dt, 1),
        })
        print(json.dumps(rows[-1]), flush=True)

    # evaluate-path SCORE_CHUNKS ladder: one 1024-pair chunk at smax=24
    # (the exact _pair_scores program shape for deep pools)
    chunk = 1024
    smax = args.max_sents
    qv = jax.random.normal(keys[3], (chunk, smax, DIM), jnp.float32)
    cv = jax.random.normal(keys[0], (chunk, smax, DIM), jnp.float32)
    lens = jnp.full((chunk,), args.sents, jnp.int32)
    qm = MultiVec(embed=qv, lens=lens)
    cm = MultiVec(embed=cv, lens=lens)
    for agg in ("l2max", "ot"):
        if agg == "ot":
            def body2(acc, qe, ce):
                s, _ = wasserstein_dist(
                    MultiVec(embed=qe + acc * 0.0, lens=lens),
                    MultiVec(embed=ce, lens=lens), temp=5000.0,
                    return_pair_sims=True, diameter="pair",
                    solver=args.solver)
                return jnp.sum(s)
        else:
            def body2(acc, qe, ce):
                s, _ = l2max_dist(
                    MultiVec(embed=qe + acc * 0.0, lens=lens),
                    MultiVec(embed=ce, lens=lens), return_pair_sims=True)
                return jnp.sum(s)
        dt = timed_loop(body2, args.iters, qm.embed, cm.embed)
        n_chunks = -(-P // chunk)
        rows.append({
            "metric": f"score_chunk_{agg}", "path": "evaluate-ladder",
            "chunk": chunk, "smax": smax,
            "solver": args.solver if agg == "ot" else "n/a",
            "ms_per_chunk": round(dt * 1e3, 3),
            "ms_per_query_at_pool": round(dt * n_chunks * 1e3, 3),
            "pairs_per_sec": round(chunk / dt, 1),
        })
        print(json.dumps(rows[-1]), flush=True)


if __name__ == "__main__":
    main()
