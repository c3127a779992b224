"""Evaluation model zoo + plugin API (SimilarityModel).

TPU re-design of src/evaluation/utils/models.py:23-768.  The public surface
is preserved -- `encode`, `get_similarity`, h5py encodings cache,
`get_faceted_encoding`, `get_model` factory -- with one addition that is the
whole point on TPU: `get_similarities` scores a query against a FULL LIST of
candidates in one jitted batched call (the reference loops 1x1 Sinkhorn
solves per candidate, evaluate.py:35-82 -- its hottest loop).

Weight sources (zero-egress friendly):
  * local HF checkpoint dirs (config.json + pytorch weights) via
    models/convert.py;
  * this framework's own orbax training runs (run_info.json contract).
"""
from __future__ import annotations

import logging
import os
from abc import ABCMeta, abstractmethod

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import RunConfig
from ..core.types import MultiVec
from ..models.bert import BertConfig, BertModel
from ..models.encoders import ConSentEncoder, ConSentSpanEncoder, BiEncoder
from ..ops.distances import wasserstein_dist, l2max_dist
from ..text.tokenize import prepare_abstracts, ner_token_spans, spans_to_mask

log = logging.getLogger(__name__)


def batchify(dataset: dict, batch_size: int):
    """Yield (pids, papers) chunks (reference utils.batchify)."""
    pids, batch = [], []
    for pid, data in dataset.items():
        pids.append(pid)
        batch.append(data)
        if len(batch) == batch_size:
            yield pids, batch
            pids, batch = [], []
    if batch:
        yield pids, batch


class SimilarityModel(metaclass=ABCMeta):
    """Abstract paper-similarity model (plugin API).

    encoding_type: 'abstract' (one vector/doc), 'sentence' (one per sentence),
    'sentence-entity' (sentences + entity vectors appended).
    """

    ENCODING_TYPES = ("abstract", "sentence", "sentence-entity")

    def __init__(self, name: str, encoding_type: str, batch_size: int = 8):
        assert encoding_type in SimilarityModel.ENCODING_TYPES
        self.name = name
        self.encoding_type = encoding_type
        self.batch_size = batch_size
        self.cache = None

    @abstractmethod
    def encode(self, batch_papers: list[dict]):
        """-> list of per-paper encodings (np arrays)."""
        raise NotImplementedError

    @abstractmethod
    def get_similarity(self, x, y) -> float:
        """Similarity between two encodings (higher = more similar)."""
        raise NotImplementedError

    def get_similarities(self, query_enc, cand_encs: list) -> np.ndarray:
        """Batched scoring; default falls back to the per-pair API."""
        return np.asarray([self.get_similarity(query_enc, c) for c in cand_encs])

    # ---- encodings cache (h5py contract, utils/models.py:68-122) ----
    def set_encodings_cache(self, cache_filename: str):
        import h5py
        if self.cache is not None:
            # close the live handle first: a second same-process open of the
            # same file trips HDF5's write lock, and the 'w' fallback below
            # would then truncate every cached encoding
            try:
                self.cache.close()
            except Exception:
                pass
            self.cache = None
        try:
            self.cache = h5py.File(cache_filename, "a")
        except Exception:
            log.warning("could not open encodings cache %s; OVERWRITING it",
                        cache_filename)
            self.cache = h5py.File(cache_filename, "w")

    def cache_encodings(self, batch_pids, batch_papers):
        assert self.cache is not None, "cache is not set"
        encodings = self.encode(batch_papers)
        for i, pid in enumerate(batch_pids):
            self.cache.create_dataset(name=pid, data=np.asarray(encodings[i]))
        return encodings

    def get_encoding(self, pids: list, dataset) -> dict:
        uncached = [p for p in pids if self.cache is None or p not in self.cache]
        out = {}
        if self.cache is not None:
            for pid in set(pids).difference(uncached):
                out[pid] = np.array(self.cache.get(pid))
        for bpids, bpapers in batchify({p: dataset.get(p) for p in uncached},
                                       self.batch_size):
            encs = (self.cache_encodings(bpids, bpapers) if self.cache is not None
                    else self.encode(bpapers))
            out.update({pid: np.asarray(encs[i]) for i, pid in enumerate(bpids)})
        return out

    # ---- facet filtering (utils/models.py:127-163) ----
    def get_faceted_encoding(self, unfaceted_encoding, facet: str, input_data: dict):
        if self.encoding_type == "abstract":
            return unfaceted_encoding
        labels = ["background" if lab == "objective_label" else lab[: -len("_label")]
                  for lab in input_data["FACETS"]]
        facet_ids = [i for i, lab in enumerate(labels) if lab == facet]
        if self.encoding_type == "sentence":
            filtered = facet_ids
        else:
            ner_cur = len(labels)
            ner_ids = []
            for i, sent_ners in enumerate(input_data["ENTITIES"]):
                if i in facet_ids:
                    ner_ids += list(range(ner_cur, ner_cur + len(sent_ners)))
                ner_cur += len(sent_ners)
            filtered = facet_ids + ner_ids
        # encode() keeps only a PREFIX of the combined [sents..., ents...]
        # rows (max_sents cap + 500-token truncation drop trailing rows --
        # the reference has no such cap, so this clamp is port-specific):
        # rows past what was actually encoded don't exist
        n_rows = len(unfaceted_encoding)
        filtered = [i for i in filtered if i < n_rows]
        return unfaceted_encoding[filtered]

    def __del__(self):
        if getattr(self, "cache", None) is not None:
            try:
                self.cache.close()
            except Exception:
                pass


# ----------------------------------------------------------------------
class AspireSimilarityModel(SimilarityModel):
    """Multi-vector contextual-sentence model (ts/otAspire checkpoints).

    agg: 'ot' (otAspire Sinkhorn), 'l2max' (tsAspire single match), or
    'cosine_max' (sentence-transformer style).
    """

    def __init__(self, name: str, bert_config: BertConfig, params, tokenizer,
                 agg: str = "ot", encoding_type: str = "sentence",
                 max_sents: int = 24, batch_size: int = 8,
                 ot_temp: float = 1.0, blur: float = 0.05, scaling: float = 0.9,
                 compute_dtype=jnp.float32, ot_solver: str = "xla",
                 seq_buckets: tuple[int, ...] | None = None):
        super().__init__(name=name, encoding_type=encoding_type, batch_size=batch_size)
        self.bert_config = bert_config
        # seq_buckets, e.g. (128, 256, 384, 512): each encode batch runs at
        # the smallest bucket covering its longest sequence instead of a
        # fixed 512 -- opt-in because every bucket is a separate compiled
        # program (the persistent compilation cache amortizes them) and
        # because bulk indexing should sort docs by length first so batches
        # are homogeneous (build-index --seq-buckets does).
        self.seq_buckets = tuple(sorted(seq_buckets)) if seq_buckets else None
        # compute_dtype=bf16: encoder activations in bf16 (params stay f32,
        # reps come back f32) -- opt-in for bulk corpus encoding; default f32
        # keeps encode parity with the reference's torch f32 path.
        self.encoder = ConSentEncoder(bert_config, max_sents=max_sents,
                                      dtype=compute_dtype)
        self.compute_dtype = compute_dtype
        # place weights on device ONCE: host numpy trees passed as jit args
        # re-transfer the full model (440 MB for BERT-base) on EVERY call --
        # over the tunneled backend that throttled corpus encoding to the
        # network, not the chip
        self.params = jax.device_put(params)
        self.tokenizer = tokenizer
        self.max_sents = max_sents
        self.agg = agg
        self.ot_temp = ot_temp
        self.blur = blur
        self.scaling = scaling

        # params ride as a jit ARGUMENT, never a closure constant: baked-in
        # weights bloat the HLO by the full model size (440 MB for
        # BERT-base), which slows compiles everywhere and exceeds the
        # remote-compile payload limit on tunneled TPU backends.
        _encode = jax.jit(lambda p, t, a, s: self.encoder.apply(
            {"params": p}, t, a, s))
        self._encode_jit = lambda *xs: _encode(self.params, *xs)

        def _encode_quant(p, t, a, s):
            _, sents = self.encoder.apply({"params": p}, t, a, s)
            sents = sents.astype(jnp.float32)         # [B, smax, d]
            sc = jnp.max(jnp.abs(sents), axis=-1) / 127.0
            sc = jnp.where(sc > 0, sc, 1.0)           # [B, smax]
            xi = jnp.clip(jnp.round(sents / sc[:, :, None]), -127, 127)
            return xi.astype(jnp.int8), sc

        _encode_q = jax.jit(_encode_quant)
        self._encode_quant_jit = lambda *xs: _encode_q(self.params, *xs)

        def _pair_scores(q: MultiVec, c: MultiVec):
            if agg == "ot":
                # per-pair annealing start: parity with the reference's 1x1
                # evaluate.py scoring, and scores don't depend on chunking.
                # ot_solver='pallas': the VMEM kernel (forward-only, ~1.4x;
                # scores agree to ~2e-3 -- evaluation default stays 'xla'
                # for strict reference parity).
                sims, _ = wasserstein_dist(q, c, blur=blur, scaling=scaling,
                                           temp=ot_temp, return_pair_sims=True,
                                           diameter="pair", solver=ot_solver)
            elif agg == "l2max":
                sims, _ = l2max_dist(q, c, return_pair_sims=True)
            elif agg == "jointsm":
                from ..ops.distances import jointsm_dist
                neg, _ = jointsm_dist(q, c, return_pair_sims=True)
                sims = -neg  # poly-encoder returns negated summed score
            elif agg == "cosine_max":
                qn = q.embed / jnp.linalg.norm(q.embed, axis=-1, keepdims=True).clip(1e-9)
                cn = c.embed / jnp.linalg.norm(c.embed, axis=-1, keepdims=True).clip(1e-9)
                sims_mat = jnp.einsum("bqd,bcd->bqc", qn, cn,
                                      precision=jax.lax.Precision.HIGHEST)
                mask = q.sent_mask()[:, :, None] * c.sent_mask()[:, None, :]
                sims = jnp.max(jnp.where(mask > 0, sims_mat, -jnp.inf), axis=(1, 2))
            else:
                raise ValueError(f"unknown agg {agg}")
            return sims

        self._pair_scores_jit = jax.jit(_pair_scores)

    # -- constructors --
    @classmethod
    def from_hf_dir(cls, name: str, model_dir: str, **kw):
        """Load a local HF aspire checkpoint directory (torch weights)."""
        import transformers
        from ..models.convert import params_from_hf_model, config_from_hf
        hf = transformers.AutoModel.from_pretrained(model_dir)
        tokenizer = transformers.AutoTokenizer.from_pretrained(model_dir)
        cfg = config_from_hf(hf.config)
        params = {"bert": params_from_hf_model(hf, cfg)}
        return cls(name=name, bert_config=cfg, params=params, tokenizer=tokenizer, **kw)

    @classmethod
    def from_trained(cls, name: str, run_dir: str, tokenizer,
                     model_version: str = "cur_best", **kw):
        """Load one of this framework's own training runs (orbax + run_info)."""
        from ..utils.checkpoint import restore_params
        rc = RunConfig.from_run_info(os.path.join(run_dir, "run_info.json"))
        params = restore_params(
            os.path.abspath(os.path.join(run_dir, f"model_{model_version}")))
        agg = "ot" if rc.model.score_aggregation == "l2wasserstein" else "l2max"
        kw.setdefault("agg", agg)
        kw.setdefault("ot_temp", rc.model.sent_sm_temp)
        kw.setdefault("blur", rc.model.geoml_blur)
        kw.setdefault("scaling", rc.model.geoml_scaling)
        kw.setdefault("max_sents", rc.model.max_sents)
        bc = (BertConfig(**rc.extra["bert_config"])
              if "bert_config" in rc.extra else BertConfig())
        return cls(name=name, bert_config=bc, params=params,
                   tokenizer=tokenizer, **kw)

    # -- API --
    def _prep(self, batch_papers):
        # ONE static shape (the reference's own 500-token cap rounds to 512):
        # each distinct BERT-base program costs ~a minute of compile/upload
        # over tunneled backends even with a warm compilation cache, which
        # dwarfs the wasted FLOPs of padding short batches to 512.
        seq_len = min(512, self.bert_config.max_position_embeddings)
        return prepare_abstracts(batch_papers, self.tokenizer,
                                 max_sents=self.max_sents, seq_len=seq_len)

    def _bucketed_arrays(self, fb):
        """Trim a featurized batch to its seq bucket (identity when off).

        Attention masking makes the trailing pad columns inert, so encoding
        at the bucket length returns the same reps as at 512 up to float
        reduction order (masked softmax sums over fewer exact-zero terms);
        only the wasted MXU work drops."""
        t, a, s = fb.token_ids, fb.attn_mask, fb.sent_ids
        if self.seq_buckets is not None:
            m = int(fb.attn_mask.sum(axis=1).max())
            # smallest bucket covering the batch; a batch LONGER than every
            # bucket keeps its full length (trimming there would cut real
            # tokens, not pad)
            b = next((b for b in self.seq_buckets if m <= b), t.shape[1])
            if b < t.shape[1]:
                t, a, s = t[:, :b], a[:, :b], s[:, :b]
        return jnp.asarray(t), jnp.asarray(a), jnp.asarray(s)

    def encode(self, batch_papers: list[dict]):
        fb = self._prep(batch_papers)
        _, sents = self._encode_jit(*self._bucketed_arrays(fb))
        sents = np.asarray(sents)
        return [sents[i, : fb.abs_lens[i]] for i in range(fb.batch)]

    def encode_quantized(self, batch_papers: list[dict]):
        """Encode + per-sentence symmetric int8 quantization ON DEVICE.

        The int8-index build path: the VPU does the scale/round/clip work
        inside the same program as the encoder, and the host downloads 1
        byte per element (+1 f32 scale per sentence) instead of 4 -- the
        transfer and the (single-core) host quantization loop both drop
        out of the indexing pipeline.  Semantics match
        index.dense.build_dense_index(dtype='int8'): scale = max|x|/127
        per sentence (1.0 for all-zero rows), round-half-even.

        Returns a list of (xi int8 [len, d], scales f32 [len]) per paper;
        feed to index.dense.build_dense_index_prequantized.
        """
        fb = self._prep(batch_papers)
        xi, sc = self._encode_quant_jit(*self._bucketed_arrays(fb))
        xi, sc = np.asarray(xi), np.asarray(sc)
        return [(xi[i, : fb.abs_lens[i]], sc[i, : fb.abs_lens[i]])
                for i in range(fb.batch)]

    def _pack(self, encs: list[np.ndarray], smax: int) -> MultiVec:
        k = len(encs)
        d = encs[0].shape[-1]
        out = np.zeros((k, smax, d), np.float32)
        lens = np.zeros((k,), np.int32)
        for i, e in enumerate(encs):
            n = min(len(e), smax)
            out[i, :n] = e[:n]
            lens[i] = n
        return MultiVec(embed=jnp.asarray(out), lens=jnp.asarray(lens))

    # chunk deep candidate pools (TRECCOVID-RF pools reach thousands) so one
    # call never materializes a [pool, smax, d] monolith.  Chunk size AND
    # sentence count are bucketed to small ladders so XLA compiles a handful
    # of shapes total while small pools (CSFCube ~50 cands) stop paying for
    # a full 1024-pair Sinkhorn per query.
    SCORE_CHUNKS = (64, 256, 1024)

    def get_similarities(self, query_enc, cand_encs: list) -> np.ndarray:
        if not cand_encs:
            return np.zeros((0,), np.float32)
        # fixed sentence bucket: one scoring shape per chunk size (pads are
        # masked; a 24-vs-16 sentence Sinkhorn costs microseconds while each
        # extra compiled shape costs ~seconds of tunnel upload)
        smax = max(len(query_enc), max(len(c) for c in cand_encs), 2)
        smax = self.max_sents if smax <= self.max_sents else -(-smax // 8) * 8
        n = len(cand_encs)
        out = np.empty((n,), np.float32)
        start = 0
        while start < n:
            rem = n - start
            size = next((c for c in self.SCORE_CHUNKS if rem <= c),
                        self.SCORE_CHUNKS[-1])
            take = min(rem, size)
            chunk = list(cand_encs[start:start + take])
            if take < size:  # pad to the ladder shape (bounded compiles)
                chunk += [chunk[-1]] * (size - take)
            q = self._pack([query_enc] * size, smax)
            c = self._pack(chunk, smax)
            out[start:start + take] = np.asarray(
                self._pair_scores_jit(q, c))[:take]
            start += take
        return out

    def get_similarity(self, x, y) -> float:
        return float(self.get_similarities(np.asarray(x), [np.asarray(y)])[0])


class AspireNERSimilarityModel(AspireSimilarityModel):
    """Entities appended as extra sentences (AspireNER, utils/models.py:211-233)."""

    def __init__(self, *args, **kw):
        # entity rows ride after the sentence rows, so facet filtering must
        # take the sentence-entity branch for ANY construction path (the
        # factory used to patch this attribute post-hoc)
        kw.setdefault("encoding_type", "sentence-entity")
        super().__init__(*args, **kw)

    @staticmethod
    def _with_entity_sents(batch_papers: list[dict]) -> list[dict]:
        assert "ENTITIES" in batch_papers[0], (
            "No NER data for input; place entities at {dataset}-ner.jsonl")
        with_ner = []
        for sample in batch_papers:
            ners = [e for sent in sample["ENTITIES"] for e in sent]
            with_ner.append({"TITLE": sample["TITLE"],
                             "ABSTRACT": list(sample["ABSTRACT"]) + ners})
        return with_ner

    def encode(self, batch_papers: list[dict]):
        return super().encode(self._with_entity_sents(batch_papers))

    def encode_quantized(self, batch_papers: list[dict]):
        # the entity rows are ordinary extra sentences for this family, so
        # the device-quantized path sees them via the same rewrite encode()
        # uses -- without this override the inherited method would silently
        # quantize the sentence rows only and int8 indexes would disagree
        # with the float path
        return super().encode_quantized(self._with_entity_sents(batch_papers))


class AspireContextNERSimilarityModel(AspireSimilarityModel):
    """Contextual entity-span model (AspireContextNER, utils/models.py:607-734,
    with the AspireConSenContextual encoder, :413-507).

    Each NER entity is represented as the MEAN OF ITS TOKEN STATES INSIDE THE
    SENTENCE CONTEXT -- not re-encoded as a standalone sentence (that is
    AspireNERSimilarityModel / reference AspireNER).  Entity reps are appended
    after the sentence reps and OT scoring runs over the combined set.
    Entities whose tokenization can't be located in the sentence (different
    extraction tokenizer) or that fall past the 500-token truncation are
    skipped, and the facet filter drops them symmetrically.
    """

    def __init__(self, *args, **kw):
        kw.setdefault("encoding_type", "sentence-entity")
        super().__init__(*args, **kw)
        # same compute dtype as the base sentence path so a bf16-compute
        # request applies to the span-encode forward too
        span_enc = ConSentSpanEncoder(self.bert_config, max_sents=self.max_sents,
                                      dtype=self.compute_dtype)

        _encode_spans = jax.jit(lambda p, t, a, s, m: span_enc.apply(
            {"params": p}, t, a, s, m))  # params as arg (see base class)
        self._encode_spans_jit = lambda *xs: _encode_spans(self.params, *xs)

    def encode(self, batch_papers: list[dict]):
        assert "ENTITIES" in batch_papers[0], (
            "No NER data for input; place entities at {dataset}-ner.jsonl")
        # pin ONE static shape like the base _prep: every distinct
        # seq-length bucket would compile a separate BERT span program
        # (~a minute each over tunneled backends)
        seq_len = min(512, self.bert_config.max_position_embeddings)
        fb, docs = prepare_abstracts(batch_papers, self.tokenizer,
                                     max_sents=self.max_sents,
                                     seq_len=seq_len, return_docs=True)
        spans = ner_token_spans(batch_papers, self.tokenizer, docs)
        mask = spans_to_mask(spans, fb.seq_len)
        _, sents, ents = self._encode_spans_jit(
            jnp.asarray(fb.token_ids), jnp.asarray(fb.attn_mask),
            jnp.asarray(fb.sent_ids), jnp.asarray(mask))
        sents, ents = np.asarray(sents), np.asarray(ents)
        out = []
        for i in range(fb.batch):
            rows = [sents[i, : fb.abs_lens[i]]]
            valid = [e for e, s in enumerate(spans[i]) if s]
            if valid:
                rows.append(ents[i, valid])
            out.append(np.concatenate(rows, axis=0))
        return out

    def encode_quantized(self, batch_papers: list[dict]):
        """int8 rows for the combined sentence+span reps.

        The span reps come from a separate program (`_encode_spans_jit`), so
        this family can't ride the device-quantized sentence encode; quantize
        the combined rows on host with the exact build_dense_index(dtype=
        'int8') scheme (scale = max|x|/127 per row, 1.0 for all-zero rows,
        round-half-even) so int8 and float indexes stay semantically equal.
        """
        out = []
        for reps in self.encode(batch_papers):
            sc = np.abs(reps).max(axis=1) / 127.0
            sc = np.where(sc > 0, sc, 1.0).astype(np.float32)
            xi = np.clip(np.rint(reps / sc[:, None]), -127, 127).astype(np.int8)
            out.append((xi, sc))
        return out

    def get_faceted_encoding(self, unfaceted_encoding, facet: str,
                             input_data: dict):
        """Filter to facet sentences + their (encodable) entities.

        Re-derives entity validity so ENTITY positions line up with the rows
        actually encoded (reference :708-734; note its filter loop only
        advances the validity counter on valid entities -- a latent
        desync bug -- so we re-derive the intended semantics: every entity
        consumes one validity slot)."""
        _, docs = prepare_abstracts([input_data], self.tokenizer,
                                    max_sents=self.max_sents, return_docs=True)
        valid = [len(s) > 0
                 for s in ner_token_spans([input_data], self.tokenizer, docs)[0]]
        filtered, eid = [], 0
        for sent_ners in input_data["ENTITIES"]:
            keep = []
            for ent in sent_ners:
                if eid < len(valid) and valid[eid]:
                    keep.append(ent)
                eid += 1
            filtered.append(keep)
        data = {**{k: v for k, v in input_data.items() if k != "ENTITIES"},
                "ENTITIES": filtered}
        return super().get_faceted_encoding(unfaceted_encoding, facet, data)


class SbertSimilarityModel(SimilarityModel):
    """Mean-pool sentence-transformer baselines (SentenceModel,
    utils/models.py:379-410): per-sentence masked mean pooling over final
    hidden states, cosine max-sim scoring.

    Loads any local HF checkpoint dir.  BERT-family checkpoints run through
    the native Flax encoder; other architectures (roberta/mpnet) fall back to
    the torch CPU module from the same directory -- these are CPU baselines
    for comparison, not the TPU serving path.
    """

    # reference hub ids for the paper's three sbert baselines; pass a local
    # clone of one of these as weights_dir (zero-egress environment)
    MODEL_PATHS = {
        "sbtinybertsota": "paraphrase-TinyBERT-L6-v2",
        "sbrobertanli": "nli-roberta-base-v2",
        "sbmpnet1B": "sentence-transformers/all-mpnet-base-v2",
    }

    def __init__(self, name: str, weights_dir: str, batch_size: int = 8,
                 max_toks: int = 512):
        super().__init__(name=name, encoding_type="sentence",
                         batch_size=batch_size)
        import transformers
        self.tokenizer = transformers.AutoTokenizer.from_pretrained(weights_dir)
        self.max_toks = max_toks  # multiple of 64 (pad_to_multiple_of below)
        hf_cfg = transformers.AutoConfig.from_pretrained(weights_dir)
        if getattr(hf_cfg, "model_type", None) == "bert":
            from ..models.convert import params_from_hf_model, config_from_hf
            hf = transformers.AutoModel.from_pretrained(weights_dir)
            cfg = config_from_hf(hf.config)
            params = jax.device_put(params_from_hf_model(hf, cfg))
            enc = BertModel(cfg)

            @jax.jit
            def _mean_pool_p(p, token_ids, attn_mask):
                last, _ = enc.apply({"params": p}, token_ids, attn_mask)
                m = attn_mask[:, :, None].astype(last.dtype)
                return jnp.sum(last * m, axis=1) / jnp.maximum(
                    jnp.sum(m, axis=1), 1e-9)

            _mean_pool = lambda t, a: _mean_pool_p(params, t, a)

            self._encode_fn = lambda ids, attn: np.asarray(
                _mean_pool(jnp.asarray(ids), jnp.asarray(attn)))
        else:
            import torch
            hf = transformers.AutoModel.from_pretrained(weights_dir)
            hf.eval()

            def _torch_encode(ids, attn):
                with torch.no_grad():
                    out = hf(input_ids=torch.from_numpy(ids).long(),
                             attention_mask=torch.from_numpy(attn).long())
                    last = out.last_hidden_state
                    m = torch.from_numpy(attn)[:, :, None].float()
                    return ((last * m).sum(1) / m.sum(1).clamp(min=1e-9)).numpy()

            self._encode_fn = _torch_encode

    def encode(self, batch_papers: list[dict]):
        sents, splits, cur = [], [], 0
        for p in batch_papers:
            sents.extend(p["ABSTRACT"])
            cur += len(p["ABSTRACT"])
            splits.append(cur)
        enc = self.tokenizer(sents, padding="longest", truncation=True,
                             max_length=self.max_toks, return_tensors="np",
                             pad_to_multiple_of=64)
        ids = np.asarray(enc["input_ids"], np.int32)
        am = np.asarray(enc["attention_mask"], np.int32)
        # bucket the row count (total sentences) so the flax path compiles a
        # handful of shapes, not one per batch composition
        n_rows = -(-len(ids) // 32) * 32
        if n_rows != len(ids):
            pad_id = self.tokenizer.pad_token_id or 0
            ids = np.pad(ids, ((0, n_rows - len(ids)), (0, 0)),
                         constant_values=pad_id)
            am = np.pad(am, ((0, n_rows - len(am)), (0, 0)))
        reps = self._encode_fn(ids, am)[: len(sents)]
        return np.split(reps, splits[:-1])

    def get_similarity(self, x, y) -> float:
        xn = x / np.clip(np.linalg.norm(x, axis=1, keepdims=True), 1e-9, None)
        yn = y / np.clip(np.linalg.norm(y, axis=1, keepdims=True), 1e-9, None)
        return float(np.max(xn @ yn.T))


class TrainedSentSimilarityModel(SimilarityModel):
    """Per-sentence encoder eval model (cosentbert / ictsentbert / SimCSE).

    The reference wraps the trained towers as SentenceTransformers and
    scores with cosine max-sim (TrainedSentModel, utils/models.py:570-604);
    the SimCSE baselines encode each sentence and return `pooler_output`
    (SimCSE, utils/models.py:322-357) and rank through the same
    score_type='cosine' sent path (pp_gen_nearest.py:1009-1072).  Here each
    abstract sentence is encoded separately: CLS rep by default, or
    tanh(dense(CLS)) when `pooler_params` is given.
    """

    def __init__(self, name: str, bert_config: BertConfig, params, tokenizer,
                 batch_size: int = 8, max_toks: int = 500,
                 pooler_params=None):
        super().__init__(name=name, encoding_type="sentence", batch_size=batch_size)
        self.tokenizer = tokenizer
        self.max_toks = max_toks
        enc = BertModel(bert_config)

        params = jax.device_put(params)  # on-device once
        if pooler_params is not None:
            from ..models.bert import BertPooler
            pooler = BertPooler(bert_config)
            pparams = jax.device_put(pooler_params)
            _encode = jax.jit(lambda p, pp, t, a: pooler.apply(
                {"params": pp}, enc.apply({"params": p}, t, a)[0]))
            self._encode_jit = lambda *xs: _encode(params, pparams, *xs)
        else:
            _encode = jax.jit(lambda p, t, a: enc.apply(
                {"params": p}, t, a)[0][:, 0, :])  # params as arg (see Aspire model)
            self._encode_jit = lambda *xs: _encode(params, *xs)

    @classmethod
    def from_hf_dir(cls, name: str, model_dir: str, **kw):
        """SimCSE-style per-sentence pooler encoder from a local HF dir."""
        import transformers
        from ..models.convert import (params_from_hf_model, config_from_hf,
                                      pooler_params_from_hf_state_dict)
        hf = transformers.AutoModel.from_pretrained(model_dir)
        tokenizer = transformers.AutoTokenizer.from_pretrained(model_dir)
        cfg = config_from_hf(hf.config)
        pooler = pooler_params_from_hf_state_dict(hf.state_dict())
        assert pooler is not None, (
            f"{model_dir} has no pooler head; SimCSE encode returns "
            "pooler_output (reference utils/models.py:330-357)")
        return cls(name=name, bert_config=cfg,
                   params=params_from_hf_model(hf, cfg), tokenizer=tokenizer,
                   pooler_params=pooler, **kw)

    def encode(self, batch_papers: list[dict]):
        sents, splits, cur = [], [], 0
        for p in batch_papers:
            sents.extend(p["ABSTRACT"])
            cur += len(p["ABSTRACT"])
            splits.append(cur)
        rows, max_len = [], 0
        for s in sents:
            ids = self.tokenizer.build_inputs_with_special_tokens(
                self.tokenizer.convert_tokens_to_ids(
                    self.tokenizer.tokenize(s)[: self.max_toks]))
            rows.append(ids)
            max_len = max(max_len, len(ids))
        max_len = -(-max_len // 64) * 64
        # pad the ROW count to a bucket too: the row dim is the batch's total
        # sentence count, and every distinct value would compile a fresh BERT
        # program (~minutes over tunneled backends); pad rows are all-pad
        # tokens, sliced off below
        n_rows = -(-len(rows) // 32) * 32
        token_ids = np.full((n_rows, max_len), self.tokenizer.pad_token_id,
                            np.int32)
        attn = np.zeros((n_rows, max_len), np.int32)
        for i, ids in enumerate(rows):
            token_ids[i, : len(ids)] = ids
            attn[i, : len(ids)] = 1
        reps = np.asarray(self._encode_jit(jnp.asarray(token_ids),
                                           jnp.asarray(attn)))[: len(rows)]
        return np.split(reps, splits[:-1])

    def get_similarity(self, x, y) -> float:
        xn = x / np.clip(np.linalg.norm(x, axis=1, keepdims=True), 1e-9, None)
        yn = y / np.clip(np.linalg.norm(y, axis=1, keepdims=True), 1e-9, None)
        return float(np.max(xn @ yn.T))


class ClsSimilarityModel(SimilarityModel):
    """Whole-abstract CLS encoders (specter/cospecter style); -L2 similarity.

    layer_mix: None -> plain final-layer CLS (BertMLM, utils/models.py:237-321);
    a [13] weight vector -> softmax scalar mix (cospecter bi-encoder).
    """

    def __init__(self, name: str, bert_config: BertConfig, params, tokenizer,
                 layer_mix: np.ndarray | None = None,
                 encoding_type: str = "abstract", batch_size: int = 8,
                 max_toks: int = 500):
        super().__init__(name=name, encoding_type=encoding_type, batch_size=batch_size)
        self.tokenizer = tokenizer
        self.max_toks = max_toks
        params = jax.device_put(params)  # on-device once
        if layer_mix is not None:
            enc = BiEncoder(bert_config)
            full = {"bert": params, "layer_weights": jnp.asarray(layer_mix)}
        else:
            enc = BertModel(bert_config)
            full = params

        @jax.jit
        def _encode_p(p, token_ids, attn_mask):
            if layer_mix is not None:
                return enc.apply({"params": p}, token_ids, attn_mask)
            last, _ = enc.apply({"params": p}, token_ids, attn_mask)
            return last[:, 0, :]

        self._encode_jit = lambda *xs: _encode_p(full, *xs)

    @classmethod
    def from_hf_dir(cls, name: str, model_dir: str, **kw):
        import transformers
        from ..models.convert import params_from_hf_model, config_from_hf
        hf = transformers.AutoModel.from_pretrained(model_dir)
        tokenizer = transformers.AutoTokenizer.from_pretrained(model_dir)
        cfg = config_from_hf(hf.config)
        return cls(name=name, bert_config=cfg,
                   params=params_from_hf_model(hf, cfg), tokenizer=tokenizer, **kw)

    def _texts(self, batch_papers):
        return [p["TITLE"] + " [SEP] " + " ".join(p["ABSTRACT"])
                for p in batch_papers]

    def encode(self, batch_papers: list[dict]):
        texts = self._texts(batch_papers)
        rows = []
        max_len = 0
        for t in texts:
            toks = self.tokenizer.tokenize(t)[: self.max_toks]
            ids = self.tokenizer.build_inputs_with_special_tokens(
                self.tokenizer.convert_tokens_to_ids(toks))
            rows.append(ids)
            max_len = max(max_len, len(ids))
        max_len = -(-max_len // 64) * 64
        token_ids = np.full((len(rows), max_len), self.tokenizer.pad_token_id, np.int32)
        attn = np.zeros((len(rows), max_len), np.int32)
        for i, ids in enumerate(rows):
            token_ids[i, : len(ids)] = ids
            attn[i, : len(ids)] = 1
        cls = self._encode_jit(jnp.asarray(token_ids), jnp.asarray(attn))
        return list(np.asarray(cls))

    def get_similarity(self, x, y) -> float:
        return -float(np.linalg.norm(np.asarray(x) - np.asarray(y)))

    def get_similarities(self, query_enc, cand_encs: list) -> np.ndarray:
        c = np.stack([np.asarray(e) for e in cand_encs])
        return -np.linalg.norm(c - np.asarray(query_enc)[None], axis=1)


class ClsNERSimilarityModel(ClsSimilarityModel):
    """CLS encoder with entities appended to the abstract text (BertNER)."""

    def _texts(self, batch_papers):
        out = []
        for p in batch_papers:
            base = p["TITLE"] + " [SEP] " + " ".join(p["ABSTRACT"])
            ents = ". ".join(e for sent in p["ENTITIES"] for e in sent)
            out.append(base + " " + ents + ".")
        return out


# ----------------------------------------------------------------------
def get_model(model_name: str, trained_model_path: str | None = None,
              weights_dir: str | None = None, tokenizer=None,
              batch_size: int = 8, ot_solver: str = "xla") -> SimilarityModel:
    """Factory keyed by the reference model names (utils/models.py:738-768).

    HF-hub-named models need `weights_dir` pointing at a local checkpoint
    directory (zero-egress environment); trained models need
    `trained_model_path` (this framework's run dir) and a tokenizer.
    ot_solver: 'xla' (reference parity) or 'pallas' (faster TPU scoring).
    """
    ot_models = {"aspire_compsci", "aspire_biomed"}
    ner_models = {"aspire_ner_compsci", "aspire_ner_biomed"}
    kw = {"batch_size": batch_size}
    akw = {**kw, "ot_solver": ot_solver}  # Aspire multi-vector models only
    if model_name in ot_models:
        assert weights_dir, f"{model_name} needs a local weights_dir"
        return AspireSimilarityModel.from_hf_dir(model_name, weights_dir,
                                                 agg="ot", **akw)
    if model_name in ner_models:
        assert weights_dir, f"{model_name} needs a local weights_dir"
        return AspireNERSimilarityModel.from_hf_dir(model_name, weights_dir,
                                                    agg="ot", **akw)
    if model_name in {"aspire_context_ner_compsci", "aspire_context_ner_biomed"}:
        assert weights_dir, f"{model_name} needs a local weights_dir"
        return AspireContextNERSimilarityModel.from_hf_dir(
            model_name, weights_dir, agg="ot", **akw)
    if model_name in {"sbtinybertsota", "sbrobertanli", "sbmpnet1B"}:
        assert weights_dir, f"{model_name} needs a local weights_dir"
        return SbertSimilarityModel(model_name, weights_dir, **kw)
    if model_name == "specter":
        assert weights_dir, f"{model_name} needs a local weights_dir"
        return ClsSimilarityModel.from_hf_dir(model_name, weights_dir, **kw)
    if model_name in {"supsimcse", "unsupsimcse"}:
        # per-SENTENCE pooler_output reps, max-cosine ranking (reference
        # SimCSE utils/models.py:322-357 + the sent rank path)
        assert weights_dir, f"{model_name} needs a local weights_dir"
        return TrainedSentSimilarityModel.from_hf_dir(model_name, weights_dir,
                                                      **kw)
    if model_name == "specter_ner":
        assert weights_dir, f"{model_name} needs a local weights_dir"
        m = ClsNERSimilarityModel.from_hf_dir(model_name, weights_dir, **kw)
        return m
    if model_name == "cospecter":
        assert trained_model_path and tokenizer is not None
        from ..utils.checkpoint import restore_params
        rc = RunConfig.from_run_info(os.path.join(trained_model_path, "run_info.json"))
        params = restore_params(
            os.path.abspath(os.path.join(trained_model_path, "model_cur_best")))
        bc = (BertConfig(**rc.extra["bert_config"])
              if "bert_config" in rc.extra else BertConfig())
        return ClsSimilarityModel(name=model_name, bert_config=bc,
                                  params=params["bert"], tokenizer=tokenizer,
                                  layer_mix=np.asarray(params["layer_weights"]),
                                  **kw)
    if model_name in {"tsaspire", "otaspire", "sbalisentbienc", "miswordbienc",
                      "miswordabsbienc", "miswordpolyenc"}:
        assert trained_model_path and tokenizer is not None
        if model_name == "miswordpolyenc":
            akw.setdefault("agg", "jointsm")
        return AspireSimilarityModel.from_trained(model_name, trained_model_path,
                                                  tokenizer, **akw)
    if model_name in {"cosentbert", "ictsentbert"}:
        assert trained_model_path and tokenizer is not None
        from ..utils.checkpoint import restore_params
        rc = RunConfig.from_run_info(os.path.join(trained_model_path, "run_info.json"))
        params = restore_params(
            os.path.abspath(os.path.join(trained_model_path, "model_cur_best")))
        if model_name == "ictsentbert":
            params = params["sent"]  # query tower scores at test time
        bc = (BertConfig(**rc.extra["bert_config"])
              if "bert_config" in rc.extra else BertConfig())
        return TrainedSentSimilarityModel(name=model_name, bert_config=bc,
                                          params=params, tokenizer=tokenizer,
                                          **kw)
    raise ValueError(f"Unknown model: {model_name}")
