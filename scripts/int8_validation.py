"""Re-validate the int8 serving recipe on ENCODER-produced representations.

The r2 claim "exact top-50 is contained in the int8 top-64" was measured on
isotropic Gaussians; real encoder outputs are anisotropic with smaller
relative score gaps, so containment at the k+14 margin must be re-measured
on reps an actual encoder produced (VERDICT r2 weak #5).  This script:

  1. encodes a corpus of abstracts with a ConSent encoder -- either a
     trained run dir (--run-dir) or a random-init BERT-base (--random-bert,
     the anisotropy stress case: untrained BERT reps are notoriously
     anisotropic);
  2. builds f32 (ground truth), bf16, and int8 dense-bucket indexes from
     the SAME reps;
  3. searches held-out encoded docs as queries and measures
       - exact(f32) top-50 containment within int8 top-64 (the recipe),
       - top-1 agreement int8 vs f32,
       - bf16-storage top-50 vs f32 top-50 overlap (storage rounding);
  4. prints one JSON summary line.

Reference exactness baseline: pp_gen_nearest.py:729-985 ranks with full
f32/f64 numpy -- the production int8 recipe must keep final (reranked)
results identical, which holds iff the exact top-50 survives stage 1.

Usage:
  python scripts/int8_validation.py --abstracts /tmp/e2e_full/triples/abstracts-0.jsonl \
      --run-dir /tmp/e2e_full/run --tokenizer /tmp/e2e_full/tokenizer --n-docs 4000
  python scripts/int8_validation.py --abstracts ... --random-bert --tokenizer ...
"""
from __future__ import annotations

import argparse
import json

import numpy as np


def encode_corpus(args, docs):
    import jax
    from aspire_tpu.train.trainer import enable_compilation_cache
    enable_compilation_cache()
    from transformers import AutoTokenizer
    from aspire_tpu.evaluation.models import AspireSimilarityModel
    from aspire_tpu.models.bert import BertConfig
    from aspire_tpu.models.encoders import ConSentEncoder
    import jax.numpy as jnp

    tok = AutoTokenizer.from_pretrained(args.tokenizer)
    if args.random_bert:
        cfg = BertConfig()
        enc = ConSentEncoder(cfg, max_sents=24)
        params = enc.init(jax.random.key(0),
                          *(np.zeros((1, 8), np.int32),) * 3)["params"]
        model = AspireSimilarityModel("random-bert", cfg, params, tok,
                                      compute_dtype=jnp.bfloat16)
    else:
        assert args.run_dir, "--run-dir or --random-bert required"
        model = AspireSimilarityModel.from_trained(
            "int8-val", args.run_dir, tok, compute_dtype=jnp.bfloat16)
    reps = []
    bs = args.batch_size
    for i in range(0, len(docs), bs):
        reps.extend(model.encode(docs[i:i + bs]))
        if (i // bs) % 20 == 0:
            print(f"encoded {i + bs}/{len(docs)}", flush=True)
    return [np.asarray(r, np.float32) for r in reps]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--abstracts", nargs="+", default=[],
                    help="abstracts jsonl file(s): {paper_id,title,abstract}")
    ap.add_argument("--from-index",
                    help="skip encoding: take encoder reps from an existing "
                         "f32 DenseBucketIndex directory (e.g. one built by "
                         "`build-index` without --bf16/--int8)")
    ap.add_argument("--run-dir")
    ap.add_argument("--random-bert", action="store_true")
    ap.add_argument("--tokenizer", help="required unless --from-index")
    ap.add_argument("--n-docs", type=int, default=4000)
    ap.add_argument("--n-queries", type=int, default=50)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--k-exact", type=int, default=50)
    ap.add_argument("--k-int8", type=int, default=64)
    ap.add_argument("--margins", default="64,96,128,192,256",
                    help="int8 stage-1 depths to test containment/rerank at")
    ap.add_argument("--final-k", type=int, default=10,
                    help="final reranked depth compared across recipes")
    args = ap.parse_args()

    if args.from_index:
        from aspire_tpu.index.dense import DenseBucketIndex
        idx0 = DenseBucketIndex.load(args.from_index)
        assert not idx0.is_int8 and "float32" in str(
            idx0.buckets[0]["sents"].dtype), "--from-index needs f32 storage"
        idx0._ensure_doc_pos()
        reps = []
        n = min(idx0.n_docs, args.n_docs + args.n_queries)
        for di in range(n):
            b = idx0.buckets[idx0._doc_bucket[di]]
            row = idx0._doc_row[di]
            reps.append(np.asarray(b["sents"][row, : idx0.doc_lens[di]],
                                   np.float32))
        print(f"loaded {len(reps)} docs' reps from {args.from_index}",
              flush=True)
    else:
        docs = []
        for path in args.abstracts:
            with open(path) as f:
                for line in f:
                    d = json.loads(line)
                    docs.append({"TITLE": d["title"], "ABSTRACT": d["abstract"]})
                    if len(docs) >= args.n_docs + args.n_queries:
                        break
            if len(docs) >= args.n_docs + args.n_queries:
                break
        assert len(docs) > args.n_queries, f"only {len(docs)} docs loaded"
        print(f"encoding {len(docs)} docs "
              f"({'random-bert' if args.random_bert else args.run_dir})",
              flush=True)
        reps = encode_corpus(args, docs)

    import jax.numpy as jnp
    from aspire_tpu.index.dense import (build_dense_index, make_dense_search,
                                        flatten_device_buckets)

    q_reps, c_reps = reps[: args.n_queries], reps[args.n_queries:]
    pids = [f"p{i}" for i in range(len(c_reps))]
    # anisotropy diagnostic: mean pairwise cosine of sentence reps (isotropic
    # Gaussians ~0; BERT-ish encoders are typically >>0)
    flat = np.concatenate([r for r in c_reps[:500]], axis=0)
    flat = flat / np.maximum(np.linalg.norm(flat, axis=1, keepdims=True), 1e-9)
    mu = flat.mean(axis=0)
    anis = float(np.dot(mu, mu))

    margins = [int(m) for m in args.margins.split(",")]
    k_deep = max(margins)
    tops = {}
    for dtype, label in ((np.float32, "f32"), ("bf16", "bf16"),
                         ("int8", "int8")):
        import ml_dtypes
        dt = ml_dtypes.bfloat16 if label == "bf16" else dtype
        idx = build_dense_index(c_reps, pids, dtype=dt)
        dev = idx.device_arrays()
        fl = flatten_device_buckets(dev)
        k = args.k_exact if label == "bf16" else k_deep
        search = make_dense_search(len(dev), k=k, int8=idx.is_int8)
        per_q = []
        for q in q_reps:
            qmax = -(-len(q) // 8) * 8
            qp = np.zeros((qmax, q.shape[1]), np.float32)
            qp[: len(q)] = q
            _, docs_i = search(jnp.asarray(qp), jnp.int32(len(q)), *fl)
            per_q.append(np.asarray(docs_i))
        tops[label] = per_q
        del dev, fl

    contain = {m: [len(set(e[: args.k_exact]) & set(i8[:m])) / args.k_exact
                   for e, i8 in zip(tops["f32"], tops["int8"])]
               for m in margins}
    top1 = [int(e[0] == i8[0]) for e, i8 in zip(tops["f32"], tops["int8"])]
    bf16_overlap = [len(set(e[: args.k_exact]) & set(b[: args.k_exact]))
                    / args.k_exact
                    for e, b in zip(tops["f32"], tops["bf16"])]

    # The metric that decides the recipe: FINAL top-k after the exact OT
    # rerank (candidates' true f32 reps), int8 stage 1 at margin m vs f32
    # stage 1 -- stage-1 containment misses are harmless iff the final
    # reranked results agree (reference exactness: pp_gen_nearest.py:729-985).
    from aspire_tpu.core.types import MultiVec
    from aspire_tpu.index.serve import ot_rerank

    def padded_reps(ids):
        smax = 20
        out = np.zeros((len(ids), smax, c_reps[0].shape[1]), np.float32)
        lens = np.zeros((len(ids),), np.int32)
        for j, di in enumerate(ids):
            r = c_reps[di][:smax]
            out[j, : len(r)] = r
            lens[j] = len(r)
        return MultiVec(embed=jnp.asarray(out), lens=jnp.asarray(lens))

    def rerank_top(q, cand_ids, kf):
        cands = padded_reps(cand_ids)
        qmax = 20
        qp = np.zeros((1, qmax, q.shape[1]), np.float32)
        qp[0, : len(q)] = q[:qmax]
        qmv = MultiVec(embed=jnp.asarray(qp),
                       lens=jnp.asarray([min(len(q), qmax)], np.int32))
        sims = np.asarray(ot_rerank(qmv, cands, temp=5000.0, solver="xla"))
        order = np.argsort(-sims)[:kf]
        return [cand_ids[j] for j in order]

    # int8 vs f32 at the SAME stage-1 depth m isolates quantization: any
    # residual disagreement at matched depth is the int8 effect.  The
    # depth-sensitivity row isolates the other axis -- how much the final
    # top-k moves when the EXACT pipeline widens its own stage-1 pool
    # (l2max stage-1 vs OT rerank ordering disagreement, independent of
    # storage dtype).
    final_agree = {}
    for m in margins:
        agree = []
        for qi, q in enumerate(q_reps):
            ref_final = rerank_top(q, list(tops["f32"][qi][:m]), args.final_k)
            i8_final = rerank_top(q, list(tops["int8"][qi][:m]), args.final_k)
            agree.append(len(set(ref_final) & set(i8_final)) / args.final_k)
        final_agree[m] = round(float(np.mean(agree)), 4)
    depth_sense = {}
    for m in margins[1:]:
        agree = []
        for qi, q in enumerate(q_reps):
            shallow = rerank_top(q, list(tops["f32"][qi][: margins[0]]),
                                 args.final_k)
            deep = rerank_top(q, list(tops["f32"][qi][:m]), args.final_k)
            agree.append(len(set(shallow) & set(deep)) / args.final_k)
        depth_sense[m] = round(float(np.mean(agree)), 4)

    print(json.dumps({
        "metric": "int8_recipe_on_encoder_reps",
        "encoder": "random-bert" if args.random_bert else args.run_dir,
        "n_docs": len(c_reps), "n_queries": len(q_reps),
        "anisotropy_mean_cos": round(anis, 4),
        "containment_top50_in_int8_topM":
            {m: round(float(np.mean(v)), 4) for m, v in contain.items()},
        "containment_min_topM":
            {m: round(float(np.min(v)), 4) for m, v in contain.items()},
        "top1_agreement_int8_stage1": round(float(np.mean(top1)), 4),
        "bf16_top50_overlap": round(float(np.mean(bf16_overlap)), 4),
        "final_top%d_agreement_after_exact_rerank" % args.final_k: final_agree,
        "f32_pipeline_depth_sensitivity_vs_top%d" % margins[0]: depth_sense,
    }))


if __name__ == "__main__":
    main()
