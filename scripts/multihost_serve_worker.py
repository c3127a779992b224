"""One process of a multi-host (DCN) SERVING job, for execution testing.

Corpus size is this system's real scaling axis (SURVEY.md §5.7): the dense
multi-vector index shards over a `shard` mesh axis and queries fan out as
per-shard scans merged by collectives.  Single-host that mesh spans one
host's chips; this worker executes the SAME serving programs over a mesh
spanning multiple processes connected by the JAX distributed runtime (the
DCN transport): every process loads the full host index, contributes only
the rows its devices own (`parallel.mesh.place` /
make_array_from_process_local_data), and the per-shard top-k all_gather and
pool-protocol psum cross the process boundary.

Drives both production paths on a deterministic synthetic corpus:
  * global retrieval: index.dense.make_dense_search_batched (sharded scan,
    per-shard top-k, all_gather merge);
  * pool protocol:    index.serve.make_pool_rank_batched (on-device pool
    gather + OT scoring, cross-shard psum).
Results are dumped per process; tests/test_multihost_dcn.py asserts both
processes agree bit-for-bit and match the single-process run exactly.

Usage (one invocation per process, same --out for all):
  python scripts/multihost_serve_worker.py --coordinator 127.0.0.1:PORT \
      --num-processes 2 --process-id 0 --out /tmp/dcn-serve
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DIM = 16
MS = 6
N_DOCS = 64


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.num_processes > 1:
        from aspire_tpu.parallel.mesh import initialize_multihost
        initialize_multihost(coordinator_address=args.coordinator,
                             num_processes=args.num_processes,
                             process_id=args.process_id)

    import numpy as np
    from jax.sharding import PartitionSpec as P
    from aspire_tpu.index.dense import (build_dense_index,
                                        flatten_device_buckets,
                                        make_dense_search_batched)
    from aspire_tpu.index.serve import make_pool_rank_batched
    from aspire_tpu.parallel.mesh import make_serving_mesh, place

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    # deterministic corpus + queries: identical on every process
    rng = np.random.default_rng(3)
    reps = [rng.normal(size=(int(rng.integers(1, MS)), DIM)).astype(np.float32)
            for _ in range(N_DOCS)]
    idx = build_dense_index(reps, [f"p{i}" for i in range(N_DOCS)],
                            n_shards=8)
    B, qmax, pool = 4, MS, 16
    q = rng.normal(size=(B, qmax, DIM)).astype(np.float32)
    q_lens = rng.integers(1, qmax + 1, B).astype(np.int32)
    for i in range(B):
        q[i, q_lens[i]:] = 0
    cand_ids = np.stack([rng.choice(N_DOCS, pool, replace=False)
                         for _ in range(B)]).astype(np.int32)

    mesh = make_serving_mesh()          # all global devices, every process
    dev = idx.device_arrays(mesh)       # index shards span the processes
    flat = flatten_device_buckets(dev)
    pos = idx.device_pos_arrays(mesh)
    qg = place(q, mesh)                 # replicated global inputs
    qlg = place(q_lens, mesh)
    cg = place(cand_ids, mesh)

    search = make_dense_search_batched(len(dev), k=10, mesh=mesh)
    scores, docs = search(qg, qlg, *flat)

    pool_fn = make_pool_rank_batched(len(dev), pool_size=pool, max_sents=MS,
                                     agg="ot", mesh=mesh, temp=5.0)
    pool_sims = pool_fn(qg, qlg, cg, *flat, *pos)

    np.savez(out / f"serve-proc{args.process_id}.npz",
             scores=np.asarray(scores), docs=np.asarray(docs),
             pool_sims=np.asarray(pool_sims))
    (out / f"serve-summary-proc{args.process_id}.json").write_text(
        json.dumps({"process_count": jax.process_count(),
                    "global_devices": len(jax.devices())}))
    print(f"[proc {args.process_id}] serving done", flush=True)


if __name__ == "__main__":
    main()
