"""1M-doc shard-merge validation on the virtual 8-device CPU mesh.

VERDICT r4 #4 second half: the on-chip 1M-doc numbers (benchmarks/
serve_bench.py --docs 1000000 --int8-only) cover the single-chip scan;
this script validates the v5e-8 MERGE path at the SAME index shape --
1M docs, int8, buckets (12, 24) -- by building one index with
n_shards=8, searching it through the sharded mesh path (per-shard top-k +
all_gather re-top-k, index/dense.py:_merge_sharded_topk) AND through the
single-device path, and asserting identical doc ids and scores.

Reference analogue: pp_gen_nearest.py:782-795 (the deep-scale NN scan).
Run: python scripts/serve_1m_mesh.py [--docs 1000000]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from aspire_tpu.index.dense import (build_dense_index, make_dense_search,
                                    flatten_device_buckets)
from aspire_tpu.parallel.mesh import make_serving_mesh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--queries", type=int, default=4)
    ap.add_argument("--k", type=int, default=64)
    args = ap.parse_args()
    assert len(jax.devices()) == 8, jax.devices()

    d = 768
    rng = np.random.default_rng(0)
    lens = np.clip(rng.poisson(9, args.docs), 3, 20)
    t0 = time.time()
    doc_reps = [rng.standard_normal((l, d), dtype=np.float32) * 2
                for l in lens]
    print(f"reps generated ({time.time()-t0:.0f}s)", flush=True)
    t0 = time.time()
    idx = build_dense_index(doc_reps, [f"p{i}" for i in range(args.docs)],
                            buckets=(12, 24), n_shards=8, dtype="int8")
    del doc_reps
    gb = sum(b["sents"].nbytes + b["norms"].nbytes + b["scales"].nbytes
             for b in idx.buckets) / 1e9
    print(f"index built: {args.docs} docs, {gb:.2f} GB int8 "
          f"({time.time()-t0:.0f}s)", flush=True)

    qs = np.pad(rng.standard_normal((args.queries, 10, d)).astype(np.float32)
                * 2, ((0, 0), (0, 6), (0, 0)))

    mesh = make_serving_mesh()
    dev8 = idx.device_arrays(mesh)
    flat8 = flatten_device_buckets(dev8)
    search8 = make_dense_search(len(dev8), k=args.k, mesh=mesh, int8=True)

    dev1 = idx.device_arrays()
    flat1 = flatten_device_buckets(dev1)
    search1 = make_dense_search(len(dev1), k=args.k, int8=True)

    for i in range(args.queries):
        q = jnp.asarray(qs[i])
        t0 = time.time()
        v8, d8 = search8(q, jnp.int32(10), *flat8)
        v8, d8 = np.asarray(v8), np.asarray(d8)
        t8 = time.time() - t0
        t0 = time.time()
        v1, d1 = search1(q, jnp.int32(10), *flat1)
        v1, d1 = np.asarray(v1), np.asarray(d1)
        t1 = time.time() - t0
        np.testing.assert_array_equal(d8, d1)
        np.testing.assert_allclose(v8, v1, rtol=1e-5, atol=1e-5)
        print(f"q{i}: 8-shard merge == single-device top-{args.k} "
              f"(ids exact, scores 1e-5) [{t8:.1f}s vs {t1:.1f}s CPU]",
              flush=True)
    print("MERGE-1M: OK", flush=True)


if __name__ == "__main__":
    main()
