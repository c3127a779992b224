"""Tokenization-contract tests with a controlled WordPiece vocab.

Uses a local vocab where every test word is a single token, so expected
token indices can be computed by hand against the reference contract
(ex_aspire_consent.py:107-181): +1 CLS offset, title (sentence 0) excluded,
500-token cap by truncating the final sentence.
"""
import numpy as np
import pytest
from transformers import BertTokenizer

from aspire_tpu.text import tokenize_doc_sents, prepare_abstracts, features_to_arrays

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
         "iota", "kappa", "title", "word"]


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + WORDS
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(vocab) + "\n")
    return BertTokenizer(str(p), do_lower_case=True)


def test_basic_contract(tok):
    doc = ["title word [SEP] ", "alpha beta gamma", "delta epsilon"]
    d = tokenize_doc_sents(doc, tok)
    # title: 3 toks (title, word, [SEP]) -> content idx 0,1,2 -> +1 => 1,2,3 (excluded)
    # sent1: alpha beta gamma -> idx 4,5,6 ; sent2: delta epsilon -> 7,8
    assert d.sent_token_idxs == [[4, 5, 6], [7, 8]]
    assert d.num_sents == 2
    # [CLS] + 8 content + [SEP]
    assert len(d.token_ids) == 10
    assert d.token_ids[0] == tok.cls_token_id
    assert d.token_ids[-1] == tok.sep_token_id
    # idxs index into token_ids at the right words
    assert tok.convert_ids_to_tokens([d.token_ids[i] for i in d.sent_token_idxs[0]]) == \
        ["alpha", "beta", "gamma"]


def test_truncation_drops_tail_of_last_sentence(tok):
    # cap at 6 content tokens: title 2 + sent1 3 fits; sent2 truncated to 1 tok
    doc = ["title [SEP] ", "alpha beta gamma", "delta epsilon zeta"]
    d = tokenize_doc_sents(doc, tok, max_num_toks=6)
    assert d.sent_token_idxs == [[3, 4, 5], [6]]
    # exact-cap boundary: sentence that would exceed by its full length is dropped
    d2 = tokenize_doc_sents(doc, tok, max_num_toks=5)
    assert d2.sent_token_idxs == [[3, 4, 5]]


def test_feature_arrays(tok):
    batch = [
        {"TITLE": "title", "ABSTRACT": ["alpha beta", "gamma delta epsilon"]},
        {"TITLE": "word", "ABSTRACT": ["zeta"]},
    ]
    fb = prepare_abstracts(batch, tok, max_sents=4, pad_multiple=16)
    assert fb.token_ids.shape == (2, 16)
    np.testing.assert_array_equal(fb.abs_lens, [2, 1])
    # doc 0: CLS title [SEP](title suffix) alpha beta gamma delta epsilon SEP
    # title tokens: "title", "[SEP]" -> content idx 0,1 -> excluded
    row = fb.sent_ids[0]
    # sentence 0 = alpha beta at positions 3,4 ; sentence 1 = gamma delta epsilon at 5,6,7
    assert list(np.where(row == 0)[0]) == [3, 4]
    assert list(np.where(row == 1)[0]) == [5, 6, 7]
    assert (row[fb.attn_mask[0] == 0] == -1).all()
    # doc 1: title tokens excluded, zeta at position 3
    assert list(np.where(fb.sent_ids[1] == 0)[0]) == [3]
    # pads
    assert fb.token_ids[1, fb.attn_mask[1] == 0].max(initial=0) == tok.pad_token_id


def test_max_sents_clipping(tok):
    batch = [{"TITLE": "title", "ABSTRACT": ["alpha", "beta", "gamma", "delta"]}]
    fb = prepare_abstracts(batch, tok, max_sents=2, pad_multiple=16)
    assert fb.abs_lens[0] == 2
    assert fb.sent_ids[0].max() == 1
