"""Serving-path benchmark: dense-bucketed l2max search + OT rerank.

Simulates the BASELINE.json config-5 per-chip load: a 1M-abstract corpus
sharded over v5e-8 puts ~125k docs on each chip; this script measures one
chip's shard scan + top-k (the all-gather merge adds ~10us of ICI for k<=100)
and the OT rerank of the top candidates.

Run: python benchmarks/serve_bench.py [--docs 125000]
"""
import argparse
import json
import pathlib
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).parent))

from aspire_tpu.index.dense import (
    build_dense_index, make_dense_search, flatten_device_buckets)
from aspire_tpu.core.types import MultiVec
from aspire_tpu.ops.distances import wasserstein_dist
from timing import timed_loop


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=125_000)
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--int8-only", action="store_true",
                    help="skip the bf16 index (capacity runs, e.g. "
                         "--docs 400000: both indexes would not fit HBM)")
    ap.add_argument("--fine-buckets", action="store_true",
                    help="(8,12,16,20,24) instead of (12,24): ~30%% less "
                         "bucket padding -- needed to fit a TRUE 1M-doc "
                         "int8 index (+scales/norms) in one chip's 16 GB")
    args = ap.parse_args()
    buckets = (8, 12, 16, 20, 24) if args.fine_buckets else (12, 24)

    d = 768
    rng = np.random.default_rng(0)
    # realistic sentence-count distribution (3..20, mean ~9)
    lens = np.clip(rng.poisson(9, args.docs), 3, 20)
    # build buckets directly on device-friendly arrays (random reps)
    import ml_dtypes
    nbytes = lens.sum() * d * (1 if args.int8_only else 2)
    kind = "int8" if args.int8_only else "bf16"
    print(f"building {args.docs}-doc dense index "
          f"(~{nbytes / 1e9:.2f} GB {kind})...", flush=True)
    doc_reps = [rng.standard_normal((l, d), dtype=np.float32) * 2 for l in lens]
    qpad = jnp.asarray(np.pad(rng.standard_normal((10, d)).astype(np.float32) * 2,
                              ((0, 6), (0, 0))))
    dt = 0.0
    if not args.int8_only:
        # coarse buckets trade ~25% padding for wide MXU blocks (~580 GB/s)
        idx = build_dense_index(doc_reps, [f"p{i}" for i in range(args.docs)],
                                buckets=buckets)
        dev = idx.device_arrays()
        flat = flatten_device_buckets(dev)
        search = make_dense_search(len(dev), k=args.k)

        def one_search(acc, qpad, *flat):
            v, i = search(qpad + acc * 0.0, jnp.int32(10), *flat)
            return v[0]

        dt = timed_loop(one_search, 30, qpad, *flat)
        gb = sum(b["sents"].nbytes + b["norms"].nbytes for b in idx.buckets) / 1e9
        print(json.dumps({"metric": "l2max_search_ms_per_query",
                          "docs": args.docs, "value": round(dt * 1000, 3),
                          "unit": "ms", "effective_gbps": round(gb / dt, 1)}))

    # OT rerank of top-k
    q = MultiVec(embed=qpad[None, :, :], lens=jnp.asarray([10], np.int32))
    if not args.int8_only:
        cand = MultiVec(
            embed=jnp.asarray(rng.standard_normal((args.k, 20, d)).astype(np.float32)),
            lens=jnp.asarray(np.clip(rng.poisson(9, args.k), 3, 20).astype(np.int32)))

    def mk_rerank(scaling, max_iters, cand_lens, solver="xla"):
        def one_rerank(acc, qe, ce):
            qq = MultiVec(embed=qe + acc * 0.0, lens=q.lens)
            k = ce.shape[0]
            qt = MultiVec(embed=jnp.broadcast_to(qq.embed, (k,) + qq.embed.shape[1:]),
                          lens=jnp.broadcast_to(qq.lens, (k,)))
            sims, _ = wasserstein_dist(qt, MultiVec(embed=ce, lens=cand_lens),
                                       temp=5000.0, scaling=scaling,
                                       return_pair_sims=True,
                                       max_iters=max_iters, solver=solver)
            return sims[0]
        return one_rerank

    if not args.int8_only:
        for label, scaling, mi in (("parity", 0.9, 128), ("fast", 0.8, 64)):
            dt_r = timed_loop(mk_rerank(scaling, mi, cand.lens), 300,
                              q.embed, cand.embed)
            print(json.dumps({"metric": f"ot_rerank_ms_topk_{label}", "k": args.k,
                              "scaling": scaling, "value": round(dt_r * 1000, 3),
                              "unit": "ms"}))
            print(json.dumps({"metric": f"end_to_end_query_ms_{label}",
                              "value": round((dt + dt_r) * 1000, 3), "unit": "ms",
                              "vs_target_5ms": round((dt + dt_r) * 1000 / 5.0, 3)}))
        # production int8 recipe: int8 first stage at k=64 (exact top-50 is
        # contained in the int8 top-64 -- RESULTS_r2.md) + exact OT rerank
        del dev, flat, search
    idx8 = build_dense_index(doc_reps, [f"p{i}" for i in range(args.docs)],
                             buckets=buckets, dtype="int8")
    del doc_reps
    dev8 = idx8.device_arrays()
    flat8 = flatten_device_buckets(dev8)
    search8 = make_dense_search(len(dev8), k=64, int8=True)

    def one_search8(acc, qpad, *flat8):
        v, i = search8(qpad + acc * 0.0, jnp.int32(10), *flat8)
        return v[0]

    dt8 = timed_loop(one_search8, 30, qpad, *flat8)
    gb8 = sum(b["sents"].nbytes + b["norms"].nbytes +
              b.get("scales", np.zeros(0)).nbytes for b in idx8.buckets) / 1e9
    rec = {"metric": "l2max_search_ms_per_query_int8",
           "docs": args.docs, "k": 64,
           "value": round(dt8 * 1000, 3), "unit": "ms",
           "effective_gbps": round(gb8 / dt8, 1)}
    if not args.int8_only:
        rec["speedup_vs_bf16"] = round(dt / dt8, 2)
    print(json.dumps(rec))
    cand64 = MultiVec(
        embed=jnp.asarray(rng.standard_normal((64, 20, d)).astype(np.float32)),
        lens=jnp.asarray(np.clip(rng.poisson(9, 64), 3, 20).astype(np.int32)))
    # production rerank path: ot_rerank defaults to the pallas solver
    dt_r64 = timed_loop(mk_rerank(0.9, 128, cand64.lens, solver="pallas"), 300,
                        q.embed, cand64.embed)
    print(json.dumps({"metric": "end_to_end_query_ms_int8_production",
                      "value": round((dt8 + dt_r64) * 1000, 3), "unit": "ms",
                      "vs_target_5ms": round((dt8 + dt_r64) * 1000 / 5.0, 3)}))

    # ---- FULL query path: search + host candidate fetch + rerank ----
    # The host stage is real: device_get the top-64 doc ids, gather their
    # sentence reps on the host (DenseBucketIndex.gather_doc_reps, O(k) via
    # the precomputed inverse map), upload, rerank.  Timed over whole wall
    # clock per query; the tunnel's ~25 ms/device_get RTT is reported
    # separately (a colocated server pays ~us for the same transfer), and
    # the RTT-corrected number subtracts the measured RTTs actually paid.
    import time as _time
    from timing import tunnel_rtt
    from aspire_tpu.index.serve import ot_rerank

    rtt = tunnel_rtt()
    n_q = 12
    qs = [jnp.asarray(np.pad(
            rng.standard_normal((10, d)).astype(np.float32) * 2,
            ((0, 6), (0, 0)))) for _ in range(n_q)]

    def full_query(qpad):
        _, docs = search8(qpad, jnp.int32(10), *flat8)
        docs_np = np.asarray(docs)                      # device_get (1 RTT)
        t_h0 = _time.perf_counter()
        cands = idx8.gather_doc_reps(docs_np, max_sents=20)  # host gather
        t_host = _time.perf_counter() - t_h0
        qmv = MultiVec(embed=qpad[None], lens=jnp.asarray([10], np.int32))
        sims = ot_rerank(qmv, cands, temp=5000.0, solver="pallas")
        return np.asarray(sims), t_host                  # device_get (1 RTT)

    full_query(qs[0])  # warm compiles
    full_query(qs[1])  # steady state (first executions do layout work)
    t0 = _time.perf_counter()
    host_times = [full_query(qv)[1] for qv in qs]
    wall = (_time.perf_counter() - t0) / n_q
    host_gather_ms = 1000 * float(np.mean(host_times))
    print(json.dumps({"metric": "full_query_path_ms_int8",
                      "docs": args.docs, "k": 64,
                      "value": round((wall - 2 * rtt) * 1000, 3), "unit": "ms",
                      "note": "search + host candidate fetch + OT rerank, "
                              "wall-clock minus 2 tunnel RTTs",
                      "host_gather_ms": round(host_gather_ms, 3),
                      "wall_ms_with_tunnel": round(wall * 1000, 3),
                      "tunnel_rtt_ms": round(rtt * 1000, 3),
                      "vs_target_5ms": round((wall - 2 * rtt) * 1000 / 5.0, 3)}))

    # ---- FUSED one-dispatch path: the same three stages inside ONE jit ----
    # search + device candidate gather + OT rerank with no host in between
    # (index.serve.make_fused_query): the honest end-to-end number -- a
    # query costs one dispatch + one device_get no matter how far the host
    # sits from the chip.
    from aspire_tpu.index.serve import make_fused_query, make_fused_query_batched
    pos8 = idx8.device_pos_arrays()
    fq = make_fused_query(len(dev8), k=64, max_sents=20, int8=True,
                          temp=5000.0, scaling=0.9, max_iters=128,
                          solver="pallas")

    def one_fused(acc, qpad, *rest):
        v, d, s = fq(qpad + acc * 0.0, jnp.int32(10), *rest)
        return s[0]

    dt_fq = timed_loop(one_fused, 30, qpad, *flat8, *pos8)
    print(json.dumps({"metric": "fused_query_path_ms_int8",
                      "docs": args.docs, "k": 64,
                      "value": round(dt_fq * 1000, 3), "unit": "ms",
                      "note": "search + device candidate gather + OT rerank "
                              "fused in one jitted dispatch",
                      "vs_target_5ms": round(dt_fq * 1000 / 5.0, 3)}))

    # ---- batched-query serving (B=32): per-query cost amortized ----
    B = 32
    from aspire_tpu.index.dense import make_dense_search_batched
    bs = make_dense_search_batched(len(dev8), k=64, int8=True, q_chunk=8)
    qb = jnp.asarray(rng.standard_normal((B, 16, d)).astype(np.float32))
    qlens = jnp.asarray(np.full((B,), 10, np.int32))

    def one_batched(acc, qb, *flat8):
        v, i = bs(qb + acc * 0.0, qlens, *flat8)
        return v[0, 0]

    dt_b = timed_loop(one_batched, 10, qb, *flat8)
    print(json.dumps({"metric": "l2max_search_ms_per_query_int8_batch32",
                      "docs": args.docs, "k": 64, "q_chunk": 8,
                      "value": round(dt_b * 1000 / B, 3), "unit": "ms",
                      "batch_ms": round(dt_b * 1000, 3),
                      "speedup_vs_single": round(dt8 / (dt_b / B), 2)}))

    # fused batched serving: B=32 full query paths in one dispatch.
    # q_chunk 4 at the 1M capacity config: the fused program materializes a
    # [bucket_docs, sents, q_chunk, 16] f32 score block plus a layout copy
    # of the largest int8 bucket; at q_chunk=8 that is 2.4G + 4.8G and the
    # total program overshoots the 16G HBM by 33M (measured OOM report).
    fq_chunk = 4 if args.fine_buckets else 8
    fqb = make_fused_query_batched(len(dev8), k=64, max_sents=20, int8=True,
                                   q_chunk=fq_chunk, temp=5000.0, scaling=0.9,
                                   max_iters=128, solver="pallas")

    def one_fused_b(acc, qb, *rest):
        v, d, s = fqb(qb + acc * 0.0, qlens, *rest)
        return s[0, 0]

    dt_fb = timed_loop(one_fused_b, 10, qb, *flat8, *pos8)
    print(json.dumps({"metric": "fused_query_path_ms_int8_batch32",
                      "docs": args.docs, "k": 64, "q_chunk": fq_chunk,
                      "value": round(dt_fb * 1000 / B, 3), "unit": "ms",
                      "batch_ms": round(dt_fb * 1000, 3),
                      "vs_target_5ms": round(dt_fb * 1000 / B / 5.0, 3)}))
    del flat8, dev8, pos8

    # ---- CLS (whole-abstract, bi-encoder) family at the same corpus ----
    # One 768-d vector per doc; the top-k IS the final ranking, so the f32
    # index scans at Precision.HIGHEST (RESULTS_r3 precision audit) -- this
    # row quantifies what that exactness costs vs bf16 storage.
    from aspire_tpu.index.cls import build_cls_index, make_cls_search_batched
    cls_reps = rng.standard_normal((args.docs, d)).astype(np.float32)
    qc = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
    for label, dt_store in (("f32_highest", np.float32), ("bf16", None)):
        if label == "bf16":
            import ml_dtypes as _md
            dt_store = _md.bfloat16
        cidx = build_cls_index(cls_reps, [f"p{i}" for i in range(args.docs)],
                               dtype=dt_store)
        creps, cnorms = cidx.device_arrays()
        csearch = make_cls_search_batched(k=args.k)

        def one_cls(acc, qc, creps, cnorms):
            v, i = csearch(qc + acc * 0.0, creps, cnorms)
            return v[0, 0]

        dt_c = timed_loop(one_cls, 50, qc, creps, cnorms)
        gb_c = (creps.nbytes + cnorms.nbytes) / 1e9
        print(json.dumps({"metric": f"cls_search_ms_per_query_{label}_batch32",
                          "docs": args.docs, "k": args.k,
                          "value": round(dt_c * 1000 / B, 4), "unit": "ms",
                          "batch_ms": round(dt_c * 1000, 3),
                          "effective_gbps": round(gb_c / dt_c, 1)}))
        del creps, cnorms, cidx


if __name__ == "__main__":
    main()
