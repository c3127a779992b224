"""Tokenization & featurization (CPU-side) with the reference contract.

Re-implements the `prepare_bert_sentences` / `prepare_abstracts` contract
(examples/ex_aspire_consent.py:107-212, src/learning/batchers.py:456-630)
that every published aspire checkpoint was trained under:

  * a document is [title, sent_1, ..., sent_n]; the title is tokenized as
    sentence 0 but its token indices are EXCLUDED from the per-sentence lists;
  * token indices are +1-shifted to account for the [CLS] prepended later;
  * inputs are capped at 500 content tokens by truncating the final sentence
    (possibly to a prefix; empty prefixes are dropped);
  * [CLS] ... [SEP] wrapping, zero segment ids, 1/0 attention mask, pad with
    the tokenizer pad id.

The TPU-facing output replaces ragged `list(list(list(int)))` token-index
structures with a dense `sent_ids[b, t]` array (sentence index per token,
-1 elsewhere) that feeds `models.encoders.sentence_pool` -- one array, static
shape, no host->device index gymnastics.
"""
from __future__ import annotations

import dataclasses

import numpy as np

MAX_NUM_TOKS = 500  # reference cap: batchers.py:569, ex_aspire_consent.py:120


@dataclasses.dataclass
class TokenizedDoc:
    """Host-side tokenization result for one document."""

    token_ids: list[int]          # with [CLS]/[SEP]
    sent_token_idxs: list[list[int]]  # per abstract sentence (title excluded)

    @property
    def num_sents(self) -> int:
        return len(self.sent_token_idxs)


@dataclasses.dataclass
class FeatureBatch:
    """Static-shape arrays for the encoder.

    token_ids: i32[b, t]; attn_mask: i32[b, t]; seg_ids: i32[b, t];
    sent_ids: i32[b, t] (-1 outside abstract sentences); abs_lens: i32[b].
    """

    token_ids: np.ndarray
    attn_mask: np.ndarray
    seg_ids: np.ndarray
    sent_ids: np.ndarray
    abs_lens: np.ndarray

    @property
    def batch(self) -> int:
        return self.token_ids.shape[0]

    @property
    def seq_len(self) -> int:
        return self.token_ids.shape[1]


def tokenize_doc_sents(doc_sents: list[str], tokenizer,
                       max_num_toks: int = MAX_NUM_TOKS) -> TokenizedDoc:
    """Tokenize one document's sentences (title first) with the 500-token
    truncate-final-sentence rule and +1 CLS offset.

    Dispatches to the native tokenizer (text/fast.py, ~80x faster) when the
    tokenizer exposes `tokenize_doc_sents` itself."""
    if hasattr(tokenizer, "tokenize_doc_sents"):
        return tokenizer.tokenize_doc_sents(doc_sents, max_num_toks=max_num_toks)
    all_token_ids: list[int] = []
    sent_idx_lists: list[list[int]] = []
    cur_len = 0
    for sent in doc_sents:
        toks = tokenizer.tokenize(sent)
        ids = tokenizer.convert_tokens_to_ids(toks)
        idxs = [cur_len + i + 1 for i in range(len(ids))]
        if cur_len + len(idxs) <= max_num_toks:
            sent_idx_lists.append(idxs)
            all_token_ids.extend(ids)
            cur_len += len(idxs)
        else:
            keep = len(idxs) - (cur_len + len(idxs) - max_num_toks)
            if keep > 0:
                sent_idx_lists.append(idxs[:keep])
                all_token_ids.extend(ids[:keep])
            break
    token_ids = tokenizer.build_inputs_with_special_tokens(token_ids_0=all_token_ids)
    # Exclude the title (sentence 0) from the per-sentence index lists.
    return TokenizedDoc(token_ids=token_ids, sent_token_idxs=sent_idx_lists[1:])


def _bucket_len(n: int, pad_multiple: int, cap: int) -> int:
    b = ((n + pad_multiple - 1) // pad_multiple) * pad_multiple
    return min(max(b, pad_multiple), cap)


def features_to_arrays(docs: list[TokenizedDoc], pad_id: int,
                       max_sents: int, pad_multiple: int = 64,
                       seq_len: int | None = None) -> FeatureBatch:
    """Pack tokenized docs into padded arrays.

    Sequence length is bucketed to `pad_multiple` (fewer XLA recompiles than
    exact-max padding) unless `seq_len` pins it.  Sentences beyond `max_sents`
    are dropped from `sent_ids` (their tokens stay in the input -- they still
    contextualize -- but pool to nothing), and `abs_lens` is clipped.
    """
    b = len(docs)
    longest = max(len(d.token_ids) for d in docs)
    t = seq_len if seq_len is not None else _bucket_len(longest, pad_multiple, 512)
    assert longest <= t, f"doc of length {longest} exceeds seq_len {t}"
    token_ids = np.full((b, t), pad_id, np.int32)
    attn = np.zeros((b, t), np.int32)
    seg = np.zeros((b, t), np.int32)
    sent_ids = np.full((b, t), -1, np.int32)
    abs_lens = np.zeros((b,), np.int32)
    for i, d in enumerate(docs):
        n = len(d.token_ids)
        token_ids[i, :n] = d.token_ids
        attn[i, :n] = 1
        abs_lens[i] = min(d.num_sents, max_sents)
        for s, idxs in enumerate(d.sent_token_idxs[:max_sents]):
            sent_ids[i, idxs] = s
    return FeatureBatch(token_ids=token_ids, attn_mask=attn, seg_ids=seg,
                        sent_ids=sent_ids, abs_lens=abs_lens)


def prepare_abstracts(batch_abs: list[dict], tokenizer, max_sents: int = 24,
                      pad_multiple: int = 64, seq_len: int | None = None,
                      max_num_toks: int = MAX_NUM_TOKS) -> FeatureBatch:
    """Featurize a batch of {'TITLE': str, 'ABSTRACT': list[str]} dicts.

    The title is prefixed as "<title> [SEP] " exactly like SPECTER/the
    reference (ex_aspire_consent.py:196-200).
    """
    docs = []
    for ex in batch_abs:
        seqs = [ex["TITLE"] + " [SEP] "]
        seqs.extend(ex["ABSTRACT"])
        docs.append(tokenize_doc_sents(seqs, tokenizer, max_num_toks=max_num_toks))
    for d in docs:
        assert d.num_sents > 0, "abstract truncated to zero sentences"
    return features_to_arrays(docs, pad_id=tokenizer.pad_token_id,
                              max_sents=max_sents, pad_multiple=pad_multiple,
                              seq_len=seq_len)
