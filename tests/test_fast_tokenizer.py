"""Native tokenizer parity vs. HF BertTokenizer and the Python packing path."""
import numpy as np
import pytest
from transformers import BertTokenizer

from aspire_tpu.text.tokenize import tokenize_doc_sents
from aspire_tpu.text.fast import FastWordPiece

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "the", "model", "we", "propose", "a", "new", "method", "for",
         "document", "similarity", "using", "optimal", "transport",
         "em", "##bed", "##ding", "##s", "and", "sentence", "-", "level",
         "(", ")", "[", "]", "1", "2", "99", ".", ",", "su", "##per",
         "##vision", "co", "##cit", "##ation", "title"]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("nv") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def hf(vocab_file):
    return BertTokenizer(vocab_file, do_lower_case=True)


@pytest.fixture(scope="module")
def fast(vocab_file):
    return FastWordPiece(vocab_file)


SENTS = [
    "We propose a new method for document similarity.",
    "Using optimal transport embeddings, and sentence-level supervision (1).",
    "The model [2] and cocitation supervision.",
    "UNKNOWNWORD99 stays unknown, (surely).",
    "punctuation...everywhere, [1] (2) [99].",
]


def test_wordpiece_parity_vs_hf(hf, fast):
    for sent in SENTS:
        want = hf.convert_tokens_to_ids(hf.tokenize(sent))
        got = fast.encode(sent).tolist()
        assert got == want, (sent, hf.tokenize(sent),
                             [VOCAB[i] for i in got])


def test_doc_packing_parity(hf, fast):
    doc = ["title [SEP] "] + SENTS[:3]
    ref = tokenize_doc_sents(doc, hf)
    got = fast.tokenize_doc_sents(doc)
    assert got.token_ids == ref.token_ids
    assert got.sent_token_idxs == ref.sent_token_idxs
    # with truncation
    ref_t = tokenize_doc_sents(doc, hf, max_num_toks=12)
    got_t = fast.tokenize_doc_sents(doc, max_num_toks=12)
    assert got_t.token_ids == ref_t.token_ids
    assert got_t.sent_token_idxs == ref_t.sent_token_idxs


def test_speed_smoke(fast, hf):
    import time
    text = " ".join(SENTS) * 4
    n = 300
    t0 = time.perf_counter()
    for _ in range(n):
        fast.encode(text)
    t_fast = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        hf.convert_tokens_to_ids(hf.tokenize(text))
    t_hf = time.perf_counter() - t0
    # should be much faster than the Python tokenizer
    assert t_fast < t_hf, (t_fast, t_hf)


UNICODE_VOCAB = VOCAB + [
    "λογος", "λ", "##ο", "##γ", "##ος", "##ς", "σ", "α", "β", "##β",
    "resume", "uber", "##ber", "数", "学", "ω",
]


@pytest.fixture(scope="module")
def uni_vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("uv") / "vocab.txt"
    p.write_text("\n".join(UNICODE_VOCAB) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def uni_hf(uni_vocab_file):
    return BertTokenizer(uni_vocab_file, do_lower_case=True)


@pytest.fixture(scope="module")
def uni_fast(uni_vocab_file):
    return FastWordPiece(uni_vocab_file)


UNICODE_SENTS = [
    # Greek lowercase + FINAL SIGMA (U+03A3 -> U+03C2 word-finally)
    "ΛΌΓΟΣ και ΣΟΦΙΑ",
    "the λόγος appears σ and Σ.",
    # accents strip via NFD (résumé -> resume, über -> uber)
    "his RÉSUMÉ and Über model",
    "naïve café, coöperate",
    # CJK ideographs get split to single chars
    "we study 数学 here",
    # unicode punctuation/quotes/dashes split like HF
    "“quoted” text — with • bullets…",
    # NBSP (Zs) is whitespace; ZWSP/soft hyphen (Cf) are dropped
    "non breaking zero​width so­ft",
    # combining marks on their own
    "á combining ë marks",
    "ΣΣ Σ, Σb",
]


def test_unicode_parity_vs_hf(uni_hf, uni_fast):
    for sent in UNICODE_SENTS:
        want = uni_hf.convert_tokens_to_ids(uni_hf.tokenize(sent))
        got = uni_fast.encode(sent).tolist()
        assert got == want, (sent, uni_hf.tokenize(sent), got, want)


def test_unicode_fuzz_parity_vs_hf(uni_hf, uni_fast, rng):
    alphabet = list("aB .,") + ["é", "Σ", "σ", "ς", "ά", "Ω", "ß", "“", "—",
                                " ", "中", "数", "λ", "Ό", "ö", "​",
                                "́", "9", "[", "²", "µ", "Å"]
    for _ in range(300):
        n = int(rng.integers(1, 24))
        s = "".join(rng.choice(alphabet) for _ in range(n))
        want = uni_hf.convert_tokens_to_ids(uni_hf.tokenize(s))
        got = uni_fast.encode(s).tolist()
        assert got == want, (repr(s), uni_hf.tokenize(s), got, want)


def test_prepare_abstracts_with_fast_tokenizer(hf, fast):
    """The featurizer must produce identical arrays through either tokenizer."""
    from aspire_tpu.text.tokenize import prepare_abstracts
    batch = [
        {"TITLE": "the model", "ABSTRACT": ["we propose a new method.",
                                            "using optimal transport (1)."]},
        {"TITLE": "title", "ABSTRACT": ["embeddings and supervision [2]."]},
    ]
    fb_hf = prepare_abstracts(batch, hf, max_sents=4, pad_multiple=16)
    fb_fast = prepare_abstracts(batch, fast, max_sents=4, pad_multiple=16)
    np.testing.assert_array_equal(fb_hf.token_ids, fb_fast.token_ids)
    np.testing.assert_array_equal(fb_hf.sent_ids, fb_fast.sent_ids)
    np.testing.assert_array_equal(fb_hf.abs_lens, fb_fast.abs_lens)
    np.testing.assert_array_equal(fb_hf.attn_mask, fb_fast.attn_mask)


def test_doc_packing_empty_sentence_parity(hf, fast):
    """A zero-token sentence (cleaned-away format chars) must occupy an
    EMPTY slot, like the HF path, so later sentences keep their indices."""
    doc = ["title [SEP] ", SENTS[0], "​", SENTS[1]]
    ref = tokenize_doc_sents(doc, hf)
    got = fast.tokenize_doc_sents(doc)
    assert ref.num_sents == 3 and ref.sent_token_idxs[1] == []
    assert got.token_ids == ref.token_ids
    assert got.sent_token_idxs == ref.sent_token_idxs
    # trailing empty sentence also keeps its slot
    doc2 = ["title [SEP] ", SENTS[0], "​"]
    ref2 = tokenize_doc_sents(doc2, hf)
    got2 = fast.tokenize_doc_sents(doc2)
    assert got2.sent_token_idxs == ref2.sent_token_idxs


def test_fast_tokenize_strings_api(hf, fast):
    """tokenize()/convert_tokens_to_ids: the entity-span matcher's API."""
    for sent in SENTS:
        assert fast.tokenize(sent) == hf.tokenize(sent)
        assert (fast.convert_tokens_to_ids(fast.tokenize(sent))
                == hf.convert_tokens_to_ids(hf.tokenize(sent)))


def test_prepare_abstracts_short_seq_len_clamps(hf):
    """seq_len < 502 must clamp the 500-token content cap, not crash the
    packing assert on the first long document."""
    from aspire_tpu.text.tokenize import prepare_abstracts
    long_doc = {"TITLE": "title",
                "ABSTRACT": ["we propose a new method " * 20] * 4}
    fb = prepare_abstracts([long_doc], hf, max_sents=6, seq_len=64)
    assert fb.token_ids.shape[1] == 64
    assert int(fb.attn_mask.sum()) <= 64
