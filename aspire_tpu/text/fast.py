"""ctypes bindings for the native tokenizer (native/aspire_text.cpp).

Builds the shared library on first use with g++ (cached by mtime); falls back
gracefully if no compiler is available -- callers should catch ImportError /
RuntimeError and use the HF tokenizer path in text/tokenize.py.
"""
from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

from .tokenize import TokenizedDoc, MAX_NUM_TOKS

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_SRC = _NATIVE_DIR / "aspire_text.cpp"
_LIB = _NATIVE_DIR / "libaspire_text.so"

_lib = None


def _build() -> pathlib.Path:
    # stale if the source OR any header (the generated unicode tables) is
    # newer than the built library
    deps = [_SRC] + sorted(_NATIVE_DIR.glob("*.h"))
    if _LIB.exists() and all(
            _LIB.stat().st_mtime >= d.stat().st_mtime for d in deps):
        return _LIB
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
           str(_SRC), "-o", str(_LIB)]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(f"native build failed:\n{proc.stderr}")
    return _LIB


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(str(_build()))
    lib.at_load_vocab.restype = ctypes.c_void_p
    lib.at_load_vocab.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.at_free_vocab.argtypes = [ctypes.c_void_p]
    lib.at_vocab_size.restype = ctypes.c_int32
    lib.at_vocab_size.argtypes = [ctypes.c_void_p]
    lib.at_token_id.restype = ctypes.c_int32
    lib.at_token_id.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.at_tokenize.restype = ctypes.c_int32
    lib.at_tokenize.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                ctypes.c_int32, i32p, ctypes.c_int32]
    lib.at_pack_doc.restype = ctypes.c_int32
    lib.at_pack_doc.argtypes = [i32p, i32p, ctypes.c_int32, ctypes.c_int32,
                                ctypes.c_int32, ctypes.c_int32, i32p, i32p,
                                np.ctypeslib.ndpointer(np.int32)]
    _lib = lib
    return lib


class FastWordPiece:
    """Native BERT tokenizer: BasicTokenizer + WordPiece, ASCII-exact vs HF.

    vocab_file: one token per line (standard BERT vocab.txt).
    """

    def __init__(self, vocab_file: str, lowercase: bool = True,
                 unk_token: str = "[UNK]", cls_token: str = "[CLS]",
                 sep_token: str = "[SEP]", pad_token: str = "[PAD]"):
        lib = _load()
        self._lib = lib
        self._vocab = lib.at_load_vocab(vocab_file.encode(), unk_token.encode())
        if not self._vocab:
            raise RuntimeError(f"could not load vocab {vocab_file}")
        self._unk_id = lib.at_token_id(self._vocab, unk_token.encode())
        self.lowercase = lowercase
        self.vocab_size = lib.at_vocab_size(self._vocab)
        self.cls_token_id = lib.at_token_id(self._vocab, cls_token.encode())
        self.sep_token_id = lib.at_token_id(self._vocab, sep_token.encode())
        self.pad_token_id = lib.at_token_id(self._vocab, pad_token.encode())
        # HF splits out special tokens before basic tokenization; mirror that.
        self._specials = {
            t: lib.at_token_id(self._vocab, t.encode())
            for t in (unk_token, cls_token, sep_token, pad_token, "[MASK]")
            if lib.at_token_id(self._vocab, t.encode()) >= 0
        }
        import re
        self._special_re = re.compile(
            "(" + "|".join(re.escape(t) for t in self._specials) + ")")
        # id -> token strings for the HF-compatible tokenize()/convert APIs
        # (the entity-span matcher compares token-string sublists)
        with open(vocab_file, encoding="utf-8") as f:
            self._id2tok = [ln.rstrip("\n") for ln in f]

    def __del__(self):
        if getattr(self, "_vocab", None):
            self._lib.at_free_vocab(self._vocab)
            self._vocab = None

    def encode(self, text: str, max_out: int = 8192) -> np.ndarray:
        """WordPiece ids for text (literal special tokens pass through)."""
        pieces: list[np.ndarray] = []
        for seg in self._special_re.split(text):
            if not seg:
                continue
            if seg in self._specials:
                pieces.append(np.asarray([self._specials[seg]], np.int32))
            else:
                out = np.empty(max_out, np.int32)
                n = self._lib.at_tokenize(self._vocab, seg.encode(),
                                          int(self.lowercase), out, max_out)
                pieces.append(out[:n].copy())
        if not pieces:
            return np.empty(0, np.int32)
        return np.concatenate(pieces)

    def tokenize(self, text: str) -> list[str]:
        """Token strings (HF BertTokenizer.tokenize drop-in): the entity-span
        matcher (text.tokenize.ner_token_spans) compares string sublists."""
        return [self._id2tok[i] for i in self.encode(text)]

    def convert_tokens_to_ids(self, tokens: list[str]) -> list[int]:
        ids = (self._lib.at_token_id(self._vocab, t.encode()) for t in tokens)
        return [i if i >= 0 else self._unk_id for i in ids]

    def tokenize_doc_sents(self, doc_sents: list[str],
                           max_num_toks: int = MAX_NUM_TOKS) -> TokenizedDoc:
        """Native equivalent of text.tokenize.tokenize_doc_sents: title-first
        sentence list -> token ids + per-sentence index lists."""
        per_sent = [self.encode(s) for s in doc_sents]
        counts = np.asarray([len(x) for x in per_sent], np.int32)
        flat = (np.concatenate(per_sent) if per_sent else
                np.empty(0, np.int32)).astype(np.int32)
        cap = int(counts.sum()) + 2
        out_tokens = np.empty(cap, np.int32)
        out_labels = np.empty(cap, np.int32)
        n_sents = np.empty(1, np.int32)
        n = self._lib.at_pack_doc(flat, counts, len(counts), max_num_toks,
                                  self.cls_token_id, self.sep_token_id,
                                  out_tokens, out_labels, n_sents)
        token_ids = out_tokens[:n].tolist()
        labels = out_labels[:n]
        sent_token_idxs = [np.nonzero(labels == s)[0].tolist()
                          for s in range(int(n_sents[0]))]
        return TokenizedDoc(token_ids=token_ids, sent_token_idxs=sent_token_idxs)
