"""Unified command-line interface.

One console entry with subcommands replacing the reference's bin/ shell
forest + per-script argparse (main_fsim.py, evaluate.py, pre_proc_buildreps,
pp_gen_nearest):

  python -m aspire_tpu train        --config cfg.json --train t.jsonl --dev d.jsonl --out run/
  python -m aspire_tpu build-index  --run-dir run/ --corpus abstracts.jsonl --out idx/
  python -m aspire_tpu rank         --index idx/ --run-dir run/ --dataset-dir d/ --dataset name --out res/
  python -m aspire_tpu evaluate     --dataset-dir d/ --dataset name --model aspire_compsci --results res/
  python -m aspire_tpu preprocess   <cocits|relish|treccovid|scidocs> ...
"""
from __future__ import annotations

import argparse
import json
import logging
import os


def _setup_logging(args):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s",
        filename=getattr(args, "log_fname", None) or None,
    )


def cmd_train(args):
    import jax

    if args.num_processes and args.num_processes > 1:
        # multi-host (DCN) bring-up: one process per host, same command on
        # each with its own --process-id.  Replaces the reference's DDP
        # launch (mp.spawn + NCCL init_process_group, main_fsim.py:36-46,
        # :257-259) AND its per-rank data-file splitting
        # (run_main_fsim-ddp.sh:51-90): every process streams the same
        # --train file; shard_batch places only the rows its devices own.
        from .parallel.mesh import initialize_multihost
        initialize_multihost(coordinator_address=args.coordinator,
                             num_processes=args.num_processes,
                             process_id=args.process_id)
    from transformers import AutoTokenizer

    from .core.config import RunConfig
    from .models.bert import BertConfig
    from .models.doc_models import build_model
    from .train.trainer import Trainer, enable_compilation_cache

    enable_compilation_cache()
    from .data.readers import TripleStream, dev_batches
    from .parallel.mesh import make_mesh

    import dataclasses

    cfg = RunConfig.from_json(args.config)
    tok_src = args.tokenizer or cfg.model.base_pt_layer
    tokenizer = AutoTokenizer.from_pretrained(tok_src)
    if args.fast_tokenizer:
        # native WordPiece (~80x the Python tokenizer; exact ids on ASCII)
        from .text.fast import FastWordPiece
        vocab_file = os.path.join(tok_src, "vocab.txt")
        fast = FastWordPiece(vocab_file)
        fast.pad_token_id = tokenizer.pad_token_id
        tokenizer = fast
    bert_config = BertConfig()  # full-size; tiny override for smoke tests
    if args.tiny:
        bert_config = BertConfig.tiny(vocab_size=tokenizer.vocab_size)
    # position ids past the table produce garbage embeddings (NaN losses),
    # so refuse the config instead of training nonsense
    assert args.seq_len <= bert_config.max_position_embeddings, (
        f"--seq-len {args.seq_len} exceeds the encoder's "
        f"max_position_embeddings={bert_config.max_position_embeddings}")
    # persist the encoder architecture so eval-time loading reconstructs it
    cfg.extra["bert_config"] = dataclasses.asdict(bert_config)
    import jax.numpy as jnp
    compute_dtype = jnp.bfloat16 if args.bf16_compute else jnp.float32
    if args.bit_reproducible:
        # threefry-stream reproducibility: naive nn.Dropout at every site
        # and naive attention numerics (the hardware-PRNG kernels are
        # deterministic per seed too, but draw DIFFERENT bit streams)
        if (args.attention_impl in ("fused", "flash")
                or args.hidden_dropout_impl == "fused" or args.fast_rng):
            raise SystemExit("--bit-reproducible conflicts with "
                             "--attention-impl fused/flash, "
                             "--hidden-dropout-impl fused and --fast-rng")
        args.attention_impl = args.attention_impl or "naive"
        args.hidden_dropout_impl = args.hidden_dropout_impl or "naive"
        args.ffn_impl = args.ffn_impl or "naive"
    if args.attention_impl:
        cfg.model = dataclasses.replace(cfg.model,
                                        attention_impl=args.attention_impl)
    if args.hidden_dropout_impl:
        cfg.model = dataclasses.replace(
            cfg.model, hidden_dropout_impl=args.hidden_dropout_impl)
    if args.ffn_impl:
        cfg.model = dataclasses.replace(cfg.model, ffn_impl=args.ffn_impl)
    model = build_model(cfg.model, bert_config, dtype=compute_dtype)
    mesh = make_mesh(n_data=args.num_devices)
    trainer = Trainer(model, cfg, args.out, mesh=mesh,
                      fused_accum=args.fused_accum,
                      rng_impl="rbg" if args.fast_rng else None)
    rng = jax.random.key(args.seed)
    state = trainer.init_state(rng)
    if args.init_hf_dir:
        import transformers
        from .models.convert import params_from_hf_model, config_from_hf
        hf = transformers.AutoModel.from_pretrained(args.init_hf_dir)
        bert_params = params_from_hf_model(hf, config_from_hf(hf.config))
        params = dict(state.params)
        params["bert"] = bert_params
        state = state.replace(params=params,
                              opt_state=trainer.optimizer.init(params))
    micro = cfg.train.batch_size
    n_micro = max(1, (cfg.train.accumulated_batch_size or micro) // micro)
    align = None
    if cfg.model.model_name == "sbalisentbienc":
        align = cfg.extra.get("align_type", "cc_align")
    seq_buckets = (tuple(int(x) for x in args.seq_buckets.split(","))
                   if args.seq_buckets else None)
    stream = TripleStream(args.train, tokenizer, cfg.model, micro_batch=micro,
                          n_micro=n_micro, seq_len=args.seq_len, align_type=align,
                          max_examples=cfg.train.train_size or None,
                          shuffle_seed=args.shuffle_seed,
                          seq_buckets=seq_buckets)
    devfn = None
    if args.dev:
        devfn = lambda: dev_batches(args.dev, tokenizer, cfg.model, batch_size=micro,
                                    seq_len=args.seq_len, align_type=align,
                                    max_examples=cfg.train.dev_size or None)
    # single train call owning the epoch loop: TripleStream re-iterates with
    # a per-epoch shuffle, and best-dev tracking stays global across epochs
    state = trainer.train(state, stream, devfn, epochs=cfg.train.num_epochs)
    print(f"trained {int(state.step)} steps -> {args.out}")


def _load_eval_model(args):
    from .evaluation.models import get_model
    tokenizer = None
    if args.tokenizer:
        from transformers import AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
    return get_model(args.model, trained_model_path=args.run_dir,
                     weights_dir=args.weights_dir, tokenizer=tokenizer,
                     batch_size=getattr(args, "batch_size", 8),
                     ot_solver=getattr(args, "ot_solver", "xla"))


def cmd_evaluate(args):
    from .train.trainer import enable_compilation_cache
    enable_compilation_cache()
    from .evaluation.datasets import EvalDataset
    from .evaluation.evaluate import run_evaluation

    dataset = EvalDataset(args.dataset, args.dataset_dir)
    model = _load_eval_model(args)
    facets = None
    if args.facet:
        facets = [None] if args.facet == "unfaceted" else [args.facet]
    out = run_evaluation(model, dataset, args.results,
                         actions=tuple(args.actions.split(",")),
                         facets=facets, cache_path=args.cache)
    print(json.dumps({k: v for k, v in out.items()}, indent=1, default=str))


def _read_corpus(path):
    """corpus jsonl -> (batch dicts for SimilarityModel.encode, pids)."""
    from .data.readers import read_jsonl
    corpus, pids = [], []
    for rec in read_jsonl(path):
        pids.append(rec["paper_id"])
        corpus.append({"TITLE": rec["title"], "ABSTRACT": rec["abstract"]})
    return corpus, pids


def _unit_rows(x):
    """Row-normalize [n, d] reps; build-time (sent index storage) and
    rank-time (queries) MUST share this so the cosine==L2 ordering
    equivalence holds."""
    import numpy as np
    x = np.asarray(x, np.float32)   # may be a read-only jit buffer
    return x / np.clip(np.linalg.norm(x, axis=1, keepdims=True), 1e-9, None)


def cmd_build_index(args):
    import numpy as np
    from transformers import AutoTokenizer

    from .train.trainer import enable_compilation_cache
    enable_compilation_cache()

    from .evaluation.models import AspireSimilarityModel
    from .index.dense import build_dense_index, build_dense_index_prequantized

    import jax.numpy as jnp

    if args.family == "cls":
        _build_cls_index_cmd(args)
        return
    if args.family == "sent":
        _build_sent_index_cmd(args)
        return

    mkw = {"compute_dtype": jnp.bfloat16} if args.bf16_compute else {}
    if args.seq_buckets:
        mkw["seq_buckets"] = tuple(
            int(x) for x in args.seq_buckets.split(","))
    model = AspireSimilarityModel.from_trained(
        "index-encoder", args.run_dir,
        AutoTokenizer.from_pretrained(args.tokenizer), **mkw) if args.run_dir \
        else AspireSimilarityModel.from_hf_dir("index-encoder",
                                               args.weights_dir, **mkw)
    corpus, pids = _read_corpus(args.corpus)
    if args.seq_buckets:
        # sort by approximate token count so batches are length-homogeneous
        # and ride the smallest bucket; index results don't depend on doc
        # order (pids travel with their reps)
        order = sorted(range(len(corpus)), key=lambda i: sum(
            len(s.split()) for s in corpus[i]["ABSTRACT"])
            + len(corpus[i]["TITLE"].split()))
        corpus = [corpus[i] for i in order]
        pids = [pids[i] for i in order]
    # int8 indexing quantizes ON DEVICE inside the encode program (VPU
    # scale/round/clip, 1-byte downloads) and the host only packs buckets
    device_quant = args.int8 and hasattr(model, "encode_quantized")
    encode = model.encode_quantized if device_quant else model.encode
    reps = []
    import time
    t0 = time.time()
    for i in range(0, len(corpus), args.batch_size):
        reps.extend(encode(corpus[i:i + args.batch_size]))
        if i and (i // args.batch_size) % 20 == 0:
            done = i + args.batch_size
            logging.info("encoded %d/%d docs (%.1f docs/s)", done,
                         len(corpus), done / (time.time() - t0))
    if device_quant:
        idx = build_dense_index_prequantized(reps, pids,
                                             n_shards=args.n_shards)
    else:
        import ml_dtypes
        dtype = ("int8" if args.int8 else
                 ml_dtypes.bfloat16 if args.bf16 else np.float32)
        idx = build_dense_index(reps, pids, n_shards=args.n_shards,
                                dtype=dtype)
    idx.save(args.out)
    print(f"indexed {idx.n_docs} docs ({len(idx.buckets)} buckets, "
          f"{args.n_shards} shards) -> {args.out}")


def _build_cls_index_cmd(args):
    """build-index --family cls: whole-abstract bi-encoder corpus index.

    One CLS vector per doc (reference buildreps 'cospecter' path,
    pre_proc_buildreps.py:309-439); served by `rank` via ClsIndex."""
    import numpy as np
    from transformers import AutoTokenizer

    from .evaluation.models import ClsSimilarityModel, get_model
    from .index.cls import build_cls_index

    if args.int8 or args.seq_buckets or args.bf16_compute:
        raise ValueError("--int8/--seq-buckets/--bf16-compute are "
                         "multi-vector options; the CLS family supports "
                         "--bf16 storage only")
    if args.model:
        # honor the eval-model name so the corpus encoder matches whatever
        # `rank --model ...` will encode queries with (e.g. a *_ner variant
        # appends entities -- a hardcoded default here would silently build
        # the index in a different input distribution than the queries)
        model = _load_eval_model(args)
    elif args.run_dir:
        model = get_model("cospecter", trained_model_path=args.run_dir,
                          tokenizer=AutoTokenizer.from_pretrained(args.tokenizer),
                          batch_size=args.batch_size)
    else:
        model = ClsSimilarityModel.from_hf_dir("index-encoder",
                                               args.weights_dir,
                                               batch_size=args.batch_size)
    corpus, pids = _read_corpus(args.corpus)
    reps = []
    for i in range(0, len(corpus), args.batch_size):
        reps.extend(model.encode(corpus[i:i + args.batch_size]))
        if i and (i // args.batch_size) % 20 == 0:
            logging.info("encoded %d/%d docs", i + args.batch_size, len(corpus))
    import ml_dtypes
    dtype = ml_dtypes.bfloat16 if args.bf16 else np.float32
    idx = build_cls_index(np.stack(reps), pids, dtype=dtype)
    idx.save(args.out)
    print(f"indexed {idx.n_docs} docs (cls) -> {args.out}")


def _build_sent_index_cmd(args):
    """build-index --family sent: per-sentence reps from the sent-bert
    family (cosentbert/ictsentbert/sbert baselines), cosine max-sim ranking.

    Mirrors the reference's build_sentbert_reps
    (pre_proc_buildreps.py:309-370) + cosine ranking
    (pp_gen_nearest.py:793-794).  Reps are stored L2-NORMALIZED so the
    standard l2max dense-bucket search ranks identically to cosine max-sim
    (for unit vectors L2^2 = 2 - 2cos); `rank` converts scores back."""
    import numpy as np

    from .index.dense import build_dense_index

    if args.int8 or args.bf16_compute or args.seq_buckets:
        raise ValueError("--int8/--bf16-compute/--seq-buckets are "
                         "aspire-family options; the sent family supports "
                         "--bf16 storage only")
    if not args.model:
        raise ValueError("--family sent needs --model (cosentbert/"
                         "ictsentbert with --run-dir, or an sbert baseline "
                         "with --weights-dir)")
    model = _load_eval_model(args)
    corpus, pids = _read_corpus(args.corpus)
    reps = []
    for i in range(0, len(corpus), args.batch_size):
        reps.extend(_unit_rows(r)
                    for r in model.encode(corpus[i:i + args.batch_size]))
        if i and (i // args.batch_size) % 20 == 0:
            logging.info("encoded %d/%d docs", i + args.batch_size, len(corpus))
    import ml_dtypes
    dtype = ml_dtypes.bfloat16 if args.bf16 else np.float32
    idx = build_dense_index(reps, pids, n_shards=args.n_shards, dtype=dtype,
                            score_type="cosine")
    idx.save(args.out)
    print(f"indexed {idx.n_docs} docs (sent/cosine, {len(idx.buckets)} "
          f"buckets, {args.n_shards} shards) -> {args.out}")


def _resolve_ot_params(args, model=None) -> tuple[float, float, float]:
    """(temp, blur, scaling) for OT scoring/reranking.

    Explicit flags win (warning on mismatch with the trained run); otherwise
    the MODEL'S OWN hyperparameters -- the loaded eval model carries them
    (AspireSimilarityModel.from_trained reads run_info.json exactly like the
    reference re-reads run_info, pp_gen_nearest.py:96-98; configs drive
    sent_sm_temp, miswordbienc-otstuni-best.json:5-7) -- falling back to the
    run_dir's run_info.json directly, then to the reference otstuni defaults
    (5000/0.05/0.9) only when no trained source exists."""
    defaults = {"temp": 5000.0, "blur": 0.05, "scaling": 0.9}
    trained = {}
    if model is not None and hasattr(model, "ot_temp"):
        trained = {"temp": model.ot_temp, "blur": model.blur,
                   "scaling": model.scaling}
    elif args.run_dir:
        info_path = os.path.join(args.run_dir, "run_info.json")
        if os.path.exists(info_path):
            from .core.config import RunConfig
            rc = RunConfig.from_run_info(info_path)
            trained = {"temp": rc.model.sent_sm_temp,
                       "blur": rc.model.geoml_blur,
                       "scaling": rc.model.geoml_scaling}
    out = {}
    for key, flag in (("temp", args.ot_temp), ("blur", args.ot_blur),
                      ("scaling", args.ot_scaling)):
        if flag is not None:
            if trained and abs(flag - trained[key]) > 1e-9:
                logging.warning(
                    "--ot-%s=%g overrides the trained model's %g "
                    "(run_info.json); reranking will not match the "
                    "model's training-time scoring", key, flag, trained[key])
            out[key] = float(flag)
        else:
            out[key] = float(trained.get(key, defaults[key]))
    return out["temp"], out["blur"], out["scaling"]


def _resolve_ot_solver(name: str) -> str:
    """'auto' -> pallas on TPU, xla elsewhere (interpret-mode pallas off-TPU
    is orders of magnitude slower and deviates ~2e-3 from parity)."""
    if name != "auto":
        return name
    import jax
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _pool_id_matrix(pool: dict, pid2row: dict, qpids: list, align: int = 8):
    """qpid -> cand pid lists to a padded i32[B, P] index-row matrix.

    P = largest pool size rounded up to `align` (-1 pads).  Every pool
    candidate MUST be in the index -- the pool protocol scores the FULL
    pool (pp_gen_nearest.py:241-283); a missing candidate is a corpus/pool
    mismatch, reported by name instead of silently dropped."""
    import numpy as np
    sizes = [len(pool[q]["cands"]) for q in qpids]
    pmax = max(align, -(-max(sizes) // align) * align)
    ids = np.full((len(qpids), pmax), -1, np.int32)
    for i, q in enumerate(qpids):
        for j, c in enumerate(pool[q]["cands"]):
            row = pid2row.get(c, pid2row.get(str(c)))
            if row is None:
                raise ValueError(
                    f"pool candidate {c!r} (query {q!r}) is not in the "
                    "index: the pool protocol ranks the FULL candidate pool "
                    "(pp_gen_nearest.py:241-283) -- rebuild the index over "
                    "a corpus containing every pool candidate, or use "
                    "--protocol global for corpus-wide retrieval")
            ids[i, j] = row
    return ids


def _rank_pools(args, dataset, model, mesh, index_type: str) -> None:
    """POOL protocol: score each query against exactly its candidate pool.

    This is the reference's primary ranking protocol
    (caching_scoringmodel_rank_pool_sent, pp_gen_nearest.py:241-283; every
    rank_pool* variant, :729-985): the full pool is ranked -- never global
    top-k -- so `rank -> eval_pool_ranking` reproduces the paper's
    evaluation.  Candidate reps are gathered on device from the index and
    scored with the model's own aggregation (OT with the trained
    hyperparameters / l2max / jointsm / cosine max-sim / CLS -L2) at exact
    precision in ONE jitted dispatch over all queries.
    """
    import numpy as np
    import jax.numpy as jnp
    from .index.dense import DenseBucketIndex, flatten_device_buckets

    host_to_dev = jnp.asarray
    if mesh is not None:
        # multi-process safe placement of the replicated query-side inputs
        # (under a multi-host serving job jit cannot auto-place host arrays
        # onto non-addressable devices; parallel.mesh.place)
        from .parallel.mesh import place
        host_to_dev = lambda x: place(np.asarray(x), mesh)

    pool = dataset.get_test_pool(facet=args.facet)
    qpids = list(pool)
    q_encs = model.get_encoding(qpids, dataset)

    if index_type == "cls":
        if args.facet:
            raise ValueError("a CLS index holds one whole-abstract vector "
                             "per doc; faceted ranking needs a multi-vector "
                             "index")
        if args.rerank == "ot":
            raise ValueError("OT rerank needs sentence reps; a CLS index "
                             "ranks by whole-abstract L2 only")
        from .index.cls import ClsIndex
        from .index.serve import make_cls_pool_rank_batched
        idx = ClsIndex.load(args.index)
        pid2row = {p: i for i, p in enumerate(idx.pids)}
        cand_ids = _pool_id_matrix(pool, pid2row, qpids)
        q_arr = np.stack([np.asarray(q_encs[q], np.float32).reshape(-1)
                          for q in qpids])
        reps, norms = idx.device_arrays(mesh)
        fn = make_cls_pool_rank_batched(mesh)
        sims = np.asarray(fn(host_to_dev(q_arr), host_to_dev(cand_ids),
                             reps, norms))
    else:
        idx = DenseBucketIndex.load(args.index)
        if idx.score_type == "cosine":
            # reference parity: the sent-bert family ranks by cosine max-sim
            # only (pp_gen_nearest.py:793-794); OT is an aspire multi-vector
            # scorer with an L2 ground cost
            if args.rerank == "ot":
                raise ValueError("OT rerank applies to aspire (l2) indexes; "
                                 "a --family sent index ranks by cosine "
                                 "max-sim")
            agg = "cosine_max"
        else:
            # the model's own aggregation scores the pool (the reference's
            # caching scorer uses the trained model's dist fn); an explicit
            # --rerank ot forces OT scoring of the multi-vector reps
            agg = "ot" if args.rerank == "ot" else getattr(model, "agg",
                                                           "l2max")
        logging.info("pool protocol: scoring %d query pools with agg=%s",
                     len(qpids), agg)
        pid2row = {p: i for i, p in enumerate(idx.pids)}
        cand_ids = _pool_id_matrix(pool, pid2row, qpids)
        q_list = []
        for qpid in qpids:
            q = q_encs[qpid]
            if args.facet:
                q = model.get_faceted_encoding(q, args.facet,
                                               dataset.get(qpid))
            q = np.asarray(q, np.float32)
            if idx.score_type == "cosine":
                q = _unit_rows(q)   # match the unit-normalized storage
            q_list.append(q)
        qmax = max(8, -(-max(len(q) for q in q_list) // 8) * 8)
        q_arr = np.zeros((len(q_list), qmax, idx.dim), np.float32)
        q_lens = np.ones((len(q_list),), np.int32)
        for i, q in enumerate(q_list):
            q_arr[i, : len(q)] = q
            q_lens[i] = len(q)
        ot_temp, ot_blur, ot_scaling = _resolve_ot_params(args, model)
        from .index.serve import make_pool_rank_batched
        dev = idx.device_arrays(mesh)
        fn = make_pool_rank_batched(
            len(dev), pool_size=cand_ids.shape[1], max_sents=args.max_sents,
            agg=agg, int8=idx.is_int8, mesh=mesh, blur=ot_blur,
            scaling=ot_scaling, temp=ot_temp, solver=args.ot_solver,
            score_type=idx.score_type)
        sims = np.asarray(fn(host_to_dev(q_arr), host_to_dev(q_lens),
                             host_to_dev(cand_ids),
                             *flatten_device_buckets(dev),
                             *idx.device_pos_arrays(mesh)))
    ranked = {}
    for i, qpid in enumerate(qpids):
        cands = pool[qpid]["cands"]
        s = sims[i, : len(cands)]
        order = np.argsort(-s, kind="stable")   # stable: ties keep pool order
        ranked[qpid] = [[cands[j], float(s[j])] for j in order]
    _write_rank_outputs(args, dataset, ranked)


def cmd_rank(args):
    """Rank query pools against a dense index: the production serving CLI.

    Default --protocol pool scores each query against exactly its candidate
    pool (the reference's primary protocol; see _rank_pools).  --protocol
    global instead retrieves top-k over the WHOLE corpus: queries batch
    through ONE make_dense_search_batched call (sharded over a serving mesh
    with --n-shards, intermediate bounded by --q-chunk), then OT-rerank per
    query.  Mirrors pp_gen_nearest.py:207-363 ranking + :575-635 readable
    neighbour dumps + :125-129 rep caching.
    """
    import numpy as np
    import jax.numpy as jnp

    from .train.trainer import enable_compilation_cache
    enable_compilation_cache()
    from .index.dense import (DenseBucketIndex, make_dense_search_batched,
                              flatten_device_buckets)
    from .evaluation.datasets import EvalDataset

    if getattr(args, "num_processes", None) and args.num_processes > 1:
        # multi-host serving: same command per host; index shards span the
        # hosts' devices, collectives cross DCN (see cmd_train's launch note)
        from .parallel.mesh import initialize_multihost
        initialize_multihost(coordinator_address=args.coordinator,
                             num_processes=args.num_processes,
                             process_id=args.process_id)
    args.ot_solver = _resolve_ot_solver(args.ot_solver)
    with open(os.path.join(args.index, "meta.json")) as f:
        index_type = json.load(f).get("index_type", "multivec")
    dataset = EvalDataset(args.dataset, args.dataset_dir)
    model = _load_eval_model(args)
    if args.cache:
        # process-0-only: under multi-host serving every process would
        # otherwise open/append the same h5 concurrently (HDF5 has no
        # multi-writer mode); non-zero processes just re-encode
        import jax as _jax
        if _jax.process_index() == 0:
            model.set_encodings_cache(args.cache)
    mesh = None
    if args.n_shards > 1:
        from .parallel.mesh import make_serving_mesh
        mesh = make_serving_mesh(n_shards=args.n_shards)
    host_to_dev = jnp.asarray
    if mesh is not None:
        from .parallel.mesh import place
        host_to_dev = lambda x: place(np.asarray(x), mesh)

    if args.protocol == "pool":
        _rank_pools(args, dataset, model, mesh, index_type)
        return

    if index_type == "cls":
        # whole-abstract bi-encoder corpus (reference CLS ranking,
        # pp_gen_nearest.py:638-726): one vector per doc, no facets (the
        # reference facets only sentence-rep models) and nothing to rerank
        if args.facet:
            raise ValueError("a CLS index holds one whole-abstract vector "
                             "per doc; faceted ranking needs a multi-vector "
                             "index")
        if args.rerank == "ot":
            raise ValueError("OT rerank needs sentence reps; a CLS index "
                             "ranks by whole-abstract L2 only")
        from .index.cls import ClsIndex, make_cls_search_batched
        idx = ClsIndex.load(args.index)
        pool = dataset.get_test_pool()
        qpids = list(pool)
        q_encs = model.get_encoding(qpids, dataset)
        q_arr = np.stack([np.asarray(q_encs[q], np.float32).reshape(-1)
                          for q in qpids])
        reps, norms = idx.device_arrays(mesh)
        # --q-chunk bounds the [c, rows] score intermediate here exactly as
        # it bounds the dense path's [c, n, s, q] block; queries pad to a
        # chunk multiple so lax.map sees equal chunks
        q_chunk = max(1, min(args.q_chunk, len(q_arr)))
        bsz = -(-len(q_arr) // q_chunk) * q_chunk
        if bsz > len(q_arr):
            q_arr = np.concatenate(
                [q_arr, np.zeros((bsz - len(q_arr), q_arr.shape[1]),
                                 np.float32)])
        search = make_cls_search_batched(k=args.k, mesh=mesh,
                                         q_chunk=q_chunk)
        scores, docs = search(host_to_dev(q_arr), reps, norms)
        scores, docs = np.asarray(scores), np.asarray(docs)
        ranked = {}
        for i, qpid in enumerate(qpids):
            real = docs[i] >= 0
            ranked[qpid] = [[idx.pids[d], float(s)]
                            for d, s in zip(docs[i][real], scores[i][real])]
        _write_rank_outputs(args, dataset, ranked)
        return

    idx = DenseBucketIndex.load(args.index)
    if idx.score_type == "cosine" and args.rerank == "ot":
        # reference parity: the sent-bert family ranks by cosine max-sim
        # only (pp_gen_nearest.py:793-794); OT is an aspire multi-vector
        # scorer with an L2 ground cost
        raise ValueError("OT rerank applies to aspire (l2) indexes; a "
                         "--family sent index ranks by cosine max-sim")
    dev = idx.device_arrays(mesh)
    flat = flatten_device_buckets(dev)
    pool = dataset.get_test_pool(facet=args.facet)
    qpids = list(pool)

    # encode every pool query (one cached bulk pass), then facet-filter
    q_encs = model.get_encoding(qpids, dataset)
    q_list = []
    for qpid in qpids:
        q = q_encs[qpid]
        if args.facet:
            # faceted search: only the query sentences labelled with the
            # facet participate (rank_pool_sentfaceted, pp_gen_nearest.py:988)
            q = model.get_faceted_encoding(q, args.facet, dataset.get(qpid))
        q = np.asarray(q, np.float32)
        if idx.score_type == "cosine":
            # the index stores unit vectors (_unit_rows at build time);
            # matching normalization makes -L2 ordering == cosine ordering
            # (L2^2 = 2 - 2cos)
            q = _unit_rows(q)
        q_list.append(q)

    # derive the query-row capacity from the ACTUAL encodings (a faceted
    # sentence+entity query can exceed any fixed guess), sublane-aligned
    qmax = max(8, -(-max(len(q) for q in q_list) // 8) * 8)
    q_chunk = max(1, min(args.q_chunk, len(q_list)))
    bsz = -(-len(q_list) // q_chunk) * q_chunk   # pad queries to chunk multiple
    dim = idx.dim
    q_arr = np.zeros((bsz, qmax, dim), np.float32)
    q_lens = np.ones((bsz,), np.int32)           # pad queries: 1 zero row
    for i, q in enumerate(q_list):
        q_arr[i, : len(q)] = q
        q_lens[i] = len(q)
    ranked = {}
    if args.rerank == "ot":
        # FUSED path: search + device candidate gather + Sinkhorn rerank in
        # ONE jitted dispatch for the whole (padded) query pool -- no host
        # round trip between the stages (index.serve.make_fused_query_batched;
        # per-query results proven identical to the staged
        # search/gather_doc_reps/ot_rerank pipeline, tests/test_fused_query.py)
        from .index.serve import make_fused_query_batched
        pos = idx.device_pos_arrays(mesh)
        ot_temp, ot_blur, ot_scaling = _resolve_ot_params(args, model)
        fused = make_fused_query_batched(
            len(dev), k=args.k, max_sents=args.max_sents, int8=idx.is_int8,
            mesh=mesh, q_chunk=q_chunk, temp=ot_temp, blur=ot_blur,
            scaling=ot_scaling, solver=args.ot_solver)
        _, docs, sims = fused(host_to_dev(q_arr), host_to_dev(q_lens),
                              *flat, *pos)
        docs, sims = np.asarray(docs), np.asarray(sims)
        for i, qpid in enumerate(qpids):
            real = docs[i] >= 0
            docs_i, sims_i = docs[i][real], sims[i][real]
            order = np.argsort(-sims_i)
            ranked[qpid] = [[idx.pids[docs_i[j]], float(sims_i[j])]
                            for j in order]
    else:
        # --rerank none: the scan IS the final ranking for EVERY score_type
        # (cosine sent-family AND l2 aspire indexes), so run it at HIGHEST
        # precision -- default MXU precision rounds f32 inputs to bf16 and
        # flips 2-3 near-tie top-k entries per query (precision audit,
        # RESULTS_r3.md); the reference's final l2max scoring is exact numpy
        # (pp_gen_nearest.py:939-944).  No-op for bf16/int8 storage.
        search = make_dense_search_batched(len(dev), k=args.k,
                                           int8=idx.is_int8, mesh=mesh,
                                           q_chunk=q_chunk, exact=True)
        scores, docs = search(host_to_dev(q_arr), host_to_dev(q_lens), *flat)
        scores, docs = np.asarray(scores), np.asarray(docs)
        for i, qpid in enumerate(qpids):
            real = docs[i] >= 0     # mask ids AND scores together: pairing
            docs_i = docs[i][real]  # by zip position would silently attach
            scores_i = scores[i][real]  # wrong scores if a pad ever sorted
            if idx.score_type == "cosine":
                # search scores are -L2 of unit vectors; report the
                # reference's cosine values (pp_gen_nearest.py:793-794)
                scores_i = 1.0 - scores_i * scores_i / 2.0
            ranked[qpid] = [[idx.pids[d], float(s)]  # before a real hit
                            for d, s in zip(docs_i, scores_i)]
    _write_rank_outputs(args, dataset, ranked)


def _write_rank_outputs(args, dataset, ranked: dict) -> None:
    """Ranked-pool json + readable neighbour dumps (pp_gen_nearest.py:575-635).

    Multi-host serving: only process 0 writes.  Every process computes the
    same `ranked` (the collectives are global), and on a shared filesystem
    concurrent open/truncate of one json would interleave corruptly --
    mirrors trainer.log_metric's process-0 gate and the reference's rank-0
    conditional logging.
    """
    import jax
    if jax.process_index() != 0:
        return
    from .evaluation.ranking_eval import print_pool_neighbours
    os.makedirs(args.out, exist_ok=True)
    suffix = f"-{args.facet}" if args.facet else ""
    fname = os.path.join(
        args.out, f"test-pid2pool-{args.dataset}-{args.model}{suffix}-ranked.json")
    with open(fname, "w") as f:
        json.dump(ranked, f)
    if not args.no_dumps:
        print_pool_neighbours(dataset, ranked,
                              os.path.join(args.out, f"neighbours{suffix}"),
                              top_k=args.dump_k)
    print(f"ranked {len(ranked)} queries -> {fname}")


def cmd_compare(args):
    """Welch t-test between two methods' per-query metrics
    (ranking_eval.py:611-713 significance protocol)."""
    import pandas as pd
    from .evaluation.protocols import significance_test

    def load(path):
        df = pd.read_csv(path)
        return {row["paper_id"]: row.to_dict() for _, row in df.iterrows()}

    qa, qb = load(args.results_a), load(args.results_b)
    t, p, sig = significance_test(qa, qb, metric=args.metric,
                                  n_comparisons=args.n_comparisons)
    print(json.dumps({"metric": args.metric, "t": round(t, 4),
                      "p": round(p, 6),
                      "significant_bonferroni_0.05": sig,
                      "mean_a": round(float(pd.Series(
                          [v[args.metric] for v in qa.values()]).mean()), 4),
                      "mean_b": round(float(pd.Series(
                          [v[args.metric] for v in qb.values()]).mean()), 4)}))


def cmd_preprocess(args):
    from .data import preprocess as pp
    pp.main(args)


def cmd_ner(args):
    from .data import ner
    if args.extractor == "scispacy":
        extractor = ner.scispacy_entity_extractor(args.spacy_model)
    else:
        extractor = ner.simple_entity_extractor
    n = ner.write_ner_file(args.abstracts, args.out, extractor)
    logging.info("wrote NER entities for %d papers -> %s", n, args.out)


def build_parser():
    p = argparse.ArgumentParser(prog="aspire_tpu")
    sub = p.add_subparsers(dest="subcommand", required=True)

    t = sub.add_parser("train", help="train a doc-similarity model")
    t.add_argument("--config", required=True)
    t.add_argument("--train", required=True)
    t.add_argument("--dev")
    t.add_argument("--out", required=True)
    t.add_argument("--tokenizer")
    t.add_argument("--init-hf-dir", help="local HF dir for encoder init")
    t.add_argument("--seq-len", type=int, default=512)
    t.add_argument("--num-devices", type=int, default=None)
    t.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator host:port (process 0's "
                        "address); run the same train command on every "
                        "host with its own --process-id")
    t.add_argument("--num-processes", type=int, default=None,
                   help="multi-host: total number of host processes")
    t.add_argument("--process-id", type=int, default=None,
                   help="multi-host: this process's rank (0-based)")
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--tiny", action="store_true", help="tiny BERT (smoke test)")
    t.add_argument("--bf16-compute", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="bf16 activations (params/optimizer stay f32): ~2x "
                        "MXU throughput and half the activation HBM on TPU. "
                        "Default ON (the measured-best config); "
                        "--no-bf16-compute restores f32 activations")
    t.add_argument("--fused-accum", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="fuse gradient accumulation into one wide encode "
                        "(exact same summed gradients).  Default ON: it "
                        "beats scan accumulation in every measured mode "
                        "(benchmarks/train_bench.py, RESULTS_r4); "
                        "--no-fused-accum restores the lax.scan loop "
                        "(lower peak activation memory)")
    t.add_argument("--fast-tokenizer", action="store_true",
                   help="use the native C++ WordPiece tokenizer")
    t.add_argument("--fast-rng", action="store_true",
                   help="TPU hardware bit generator (rbg) for dropout/"
                        "in-batch-negative keys: threefry mask generation "
                        "is ~half the t=512 step cost; deterministic per "
                        "seed but a different stream than the default")
    t.add_argument("--attention-impl", default=None,
                   choices=["auto", "naive", "flash", "fused"],
                   help="BERT attention backend; the default 'auto' runs "
                        "every TPU pass through the fused pallas kernel "
                        "(probs+masks stay VMEM-resident; dropout bits from "
                        "the TPU hardware PRNG -- deterministic per seed, "
                        "different mask stream than naive; see "
                        "--bit-reproducible)")
    t.add_argument("--hidden-dropout-impl", default=None,
                   choices=["auto", "naive", "fused"],
                   help="hidden/embedding dropout backend; the default "
                        "'auto' draws keep masks from the TPU hardware PRNG "
                        "inside a pallas kernel (ops/pallas_dropout.py) so "
                        "no [b,t,h] mask bits are generated, stored for the "
                        "backward, or moved through HBM (same stream trade "
                        "as attention; see --bit-reproducible)")
    t.add_argument("--ffn-impl", default=None,
                   choices=["auto", "naive", "fused"],
                   help="FFN backend; the default 'auto' runs no-grad "
                        "TPU forwards through the fused pallas "
                        "dense-gelu-dense kernel ([tokens,4h] intermediate "
                        "VMEM-resident, 1.45x; ops/pallas_ffn.py) while "
                        "grad passes stay on XLA's measured-at-floor path; "
                        "'naive' restores nn.Dense everywhere (exact "
                        "--bit-reproducible numerics; no RNG involved)")
    t.add_argument("--bit-reproducible", action="store_true",
                   help="reproduce the documented threefry dropout bit "
                        "streams exactly: forces naive (nn.Dropout) "
                        "attention-prob and hidden dropout and naive "
                        "attention/FFN numerics.  ~1.3x slower at the "
                        "reference config (266 vs 207 ms/step, RESULTS_r4); "
                        "same keep-probability either way")
    t.add_argument("--seq-buckets",
                   help="comma-separated length buckets, e.g. 192,320,512")
    t.add_argument("--shuffle-seed", type=int, default=None,
                   help="per-epoch seeded shuffle of the training stream")
    t.add_argument("--log_fname")
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("evaluate", help="encode/score/evaluate a dataset")
    e.add_argument("--dataset", required=True)
    e.add_argument("--dataset-dir", required=True)
    e.add_argument("--model", required=True)
    e.add_argument("--results", required=True)
    e.add_argument("--actions", default="encode,score,evaluate")
    e.add_argument("--facet", help="background|method|result|unfaceted")
    e.add_argument("--cache")
    e.add_argument("--batch-size", type=int, default=8,
                   help="encode batch size (raise on TPU; reference used 8)")
    e.add_argument("--ot-solver", choices=["xla", "pallas"], default="xla",
                   help="OT scoring solver: xla (reference parity) or "
                        "pallas (~1.4x on TPU; scores agree to ~2e-3)")
    e.add_argument("--run-dir")
    e.add_argument("--weights-dir")
    e.add_argument("--tokenizer")
    e.add_argument("--log_fname")
    e.set_defaults(fn=cmd_evaluate)

    b = sub.add_parser("build-index", help="encode a corpus into a sharded index")
    b.add_argument("--corpus", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--run-dir")
    b.add_argument("--weights-dir")
    b.add_argument("--tokenizer")
    b.add_argument("--family", choices=["multivec", "cls", "sent"],
                   default="multivec",
                   help="multivec: aspire sentence reps (l2/OT scoring); "
                        "cls: one whole-abstract vector per doc (specter/"
                        "cospecter bi-encoders); sent: per-sentence reps "
                        "from the sent-bert family, cosine max-sim")
    b.add_argument("--model",
                   help="(--family sent) eval-model name, e.g. cosentbert/"
                        "ictsentbert (--run-dir) or sbtinybertsota "
                        "(--weights-dir)")
    b.add_argument("--n-shards", type=int, default=1)
    b.add_argument("--batch-size", type=int, default=32)
    b.add_argument("--bf16", action="store_true")
    b.add_argument("--int8", action="store_true",
                   help="per-sentence-scale int8 storage (half the scan bytes)")
    b.add_argument("--bf16-compute", action="store_true",
                   help="encode with bf16 activations (reps stay f32)")
    b.add_argument("--seq-buckets",
                   help="comma list, e.g. 128,256,384,512: sort the corpus "
                        "by length and encode each batch at the smallest "
                        "bucket covering it (identical reps, less MXU waste)")
    b.add_argument("--log_fname")
    b.set_defaults(fn=cmd_build_index)

    r = sub.add_parser("rank", help="rank query pools against an index")
    r.add_argument("--index", required=True)
    r.add_argument("--dataset", required=True)
    r.add_argument("--dataset-dir", required=True)
    r.add_argument("--model", required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--facet")
    r.add_argument("--protocol", choices=["pool", "global"], default="pool",
                   help="pool (default): rank each query's FULL candidate "
                        "pool from test-pid2anns -- the reference's "
                        "evaluation protocol (pp_gen_nearest.py:241-283); "
                        "global: corpus-wide top-k retrieval + optional OT "
                        "rerank (a serving capability beyond the reference)")
    r.add_argument("--k", type=int, default=100,
                   help="top-k for --protocol global (pool mode ranks the "
                        "whole pool)")
    r.add_argument("--rerank", choices=["none", "ot"], default="none")
    r.add_argument("--ot-temp", type=float, default=None,
                   help="marginal softmax temp; default: the trained run's "
                        "sent_sm_temp (run_info.json), else 5000")
    r.add_argument("--ot-blur", type=float, default=None,
                   help="Sinkhorn blur; default: trained geoml_blur, else .05")
    r.add_argument("--ot-scaling", type=float, default=None,
                   help="eps-annealing rate; default: trained geoml_scaling, "
                        "else .9")
    r.add_argument("--ot-solver", choices=["auto", "pallas", "xla"],
                   default="auto",
                   help="rerank solver: auto (pallas on TPU -- 1.4-3x at "
                        "serving k -- xla elsewhere), or force one; xla "
                        "gives strict reference-parity scores")
    r.add_argument("--max-sents", type=int, default=24)
    r.add_argument("--cache", help="h5 query-encoding cache (reference "
                                   "joblib rep cache, pp_gen_nearest.py:125)")
    r.add_argument("--n-shards", type=int, default=1,
                   help="serving mesh shards (>1: multi-chip sharded search)")
    r.add_argument("--coordinator", default=None,
                   help="multi-host serving: coordinator host:port (process "
                        "0's address); run the same command on every host "
                        "with its own --process-id")
    r.add_argument("--num-processes", type=int, default=None,
                   help="multi-host serving: total process (host) count")
    r.add_argument("--process-id", type=int, default=None,
                   help="multi-host serving: this host's process index")
    r.add_argument("--q-chunk", type=int, default=8,
                   help="query-batch chunk bounding the scan intermediate")
    r.add_argument("--no-dumps", action="store_true",
                   help="skip the readable per-query neighbour dumps")
    r.add_argument("--dump-k", type=int, default=10,
                   help="neighbours per query in the readable dumps")
    r.add_argument("--run-dir")
    r.add_argument("--weights-dir")
    r.add_argument("--tokenizer")
    r.add_argument("--log_fname")
    r.set_defaults(fn=cmd_rank)

    c = sub.add_parser("compare", help="significance test between two runs")
    c.add_argument("--results-a", required=True,
                   help="query-evaluations.csv of method A")
    c.add_argument("--results-b", required=True)
    c.add_argument("--metric", default="av_precision")
    c.add_argument("--n-comparisons", type=int, default=1)
    c.add_argument("--log_fname")
    c.set_defaults(fn=cmd_compare)

    pp = sub.add_parser("preprocess", help="dataset preparation pipelines")
    pp.add_argument("action", choices=["gorc", "cocit-examples",
                                       "regen-examples", "relish",
                                       "treccovid", "scidocs", "filter-cocits"])
    pp.add_argument("--in-path", required=True)
    pp.add_argument("--out-path", required=True)
    pp.add_argument("--extra", help="json dict of pipeline-specific options")
    pp.add_argument("--log_fname")
    pp.set_defaults(fn=cmd_preprocess)

    n = sub.add_parser("ner", help="extract entities into {dataset}-ner.jsonl")
    n.add_argument("--abstracts", required=True,
                   help="abstracts-{dataset}.jsonl input")
    n.add_argument("--out", required=True)
    n.add_argument("--extractor", choices=["simple", "scispacy"],
                   default="simple")
    n.add_argument("--spacy-model", default="en_core_sci_sm")
    n.add_argument("--log_fname")
    n.set_defaults(fn=cmd_ner)
    return p


def main(argv=None):
    # honor JAX_PLATFORMS even where a platform plugin (e.g. the axon TPU
    # tunnel) would otherwise take precedence over the env var -- the config
    # update must land before first device use
    if os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    args = build_parser().parse_args(argv)
    _setup_logging(args)
    args.fn(args)


if __name__ == "__main__":
    main()
