"""Byte-level BPE tokenizer with a native (C++) merge engine.

The reference delegates tokenization to HF ``AutoTokenizer`` (loadModel,
src/utilities.py:32-54). This module implements the byte-level BPE family
(GPT-2 / qwen2-class ``tokenizer.json`` files) natively:

- cold path in Python: tokenizer.json parsing, the GPT-2 byte<->unicode
  alphabet, regex pre-tokenization (the canonical GPT-2 pattern via the
  ``regex`` module);
- hot path in C++: the ranked-merge loop over a flattened batch of
  pre-tokens (native/bpe.cc via ctypes), with a pure-Python fallback of
  identical semantics when the toolchain is unavailable.

Parity: encode/decode match the HF ``tokenizers`` Rust library exactly on
the same tokenizer.json (tests/test_tokenizer.py trains a byte-level BPE
offline and asserts head-to-head equality). Special/added tokens beyond the
base vocabulary are out of scope — calibration/perplexity paths tokenize
with ``add_special_tokens=False`` (llm/datasets.py:81), so the base encode
is the load-bearing one.
"""

from __future__ import annotations

import ctypes
import functools
import json
import os
import subprocess
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libssp_bpe.so")

_lock = threading.Lock()
_lib = None
_tried = False

# The canonical GPT-2 pre-tokenization pattern (HF ByteLevel use_regex=True).
_GPT2_PATTERN = r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(["make", "-C", _NATIVE_DIR, "libssp_bpe.so"],
                               check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.bpe_init.restype = ctypes.c_void_p
            lib.bpe_init.argtypes = [ctypes.c_int64, ctypes.c_void_p,
                                     ctypes.c_void_p, ctypes.c_void_p]
            lib.bpe_free.argtypes = [ctypes.c_void_p]
            lib.bpe_encode_batch.restype = ctypes.c_int64
            lib.bpe_encode_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ]
            _lib = lib
        except Exception as e:
            print(f"[INFO] native BPE unavailable ({e}); using python merges")
            _lib = None
        return _lib


def native_available() -> bool:
    return _load_lib() is not None


@functools.lru_cache(maxsize=1)
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2's reversible byte <-> printable-unicode alphabet."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def load_tokenizer(model_dir: str):
    """Native-first tokenizer loading for a local HF model dir: byte-level
    BPE tokenizer.json through this module (C++ merge engine), anything else
    (SentencePiece etc.) through transformers AutoTokenizer."""
    path = os.path.join(model_dir, "tokenizer.json")
    if os.path.exists(path):
        try:
            return ByteLevelBPETokenizer.from_file(path)
        except Exception as e:
            print(f"[INFO] native tokenizer not applicable ({e}); AutoTokenizer")
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(model_dir, use_fast=False)


class ByteLevelBPETokenizer:
    """Encode/decode for byte-level BPE tokenizer.json files."""

    def __init__(self, vocab: Dict[str, int], merges: Sequence[Tuple[str, str]],
                 *, add_prefix_space: bool = False):
        import regex

        self._vocab = dict(vocab)
        self._id_to_token = {i: t for t, i in self._vocab.items()}
        self._add_prefix_space = add_prefix_space
        self._pat = regex.compile(_GPT2_PATTERN)
        self._byte_enc = bytes_to_unicode()
        self._byte_dec = {c: b for b, c in self._byte_enc.items()}

        left, right, merged, rank = [], [], [], {}
        for i, (a, b) in enumerate(merges):
            la, lb = self._vocab.get(a), self._vocab.get(b)
            lm = self._vocab.get(a + b)
            if la is None or lb is None or lm is None:
                raise ValueError(f"merge ({a!r}, {b!r}) not closed under vocab")
            left.append(la)
            right.append(lb)
            merged.append(lm)
            rank[(la, lb)] = i
        self._left = np.asarray(left, np.int32)
        self._right = np.asarray(right, np.int32)
        self._merged = np.asarray(merged, np.int32)
        self._rank = rank
        self._handle = None
        lib = _load_lib()
        if lib is not None and len(left):
            self._handle = ctypes.c_void_p(lib.bpe_init(
                len(left), self._left.ctypes.data, self._right.ctypes.data,
                self._merged.ctypes.data))
        self._word_cache: Dict[str, List[int]] = {}

    # ---------------- construction ----------------

    @classmethod
    def from_file(cls, path: str) -> "ByteLevelBPETokenizer":
        """Load an HF tokenizer.json (model.type == BPE, ByteLevel pre-tok)."""
        with open(path) as f:
            tj = json.load(f)
        model = tj["model"]
        if model.get("type") != "BPE":
            raise ValueError(f"unsupported tokenizer model {model.get('type')}")
        merges = [tuple(m.split(" ", 1)) if isinstance(m, str) else tuple(m)
                  for m in model["merges"]]
        add_prefix = False
        saw_byte_level = False
        custom_split = False

        def walk(node):
            nonlocal add_prefix, saw_byte_level, custom_split
            if isinstance(node, dict):
                if node.get("type") == "ByteLevel":
                    saw_byte_level = True
                    add_prefix = bool(node.get("add_prefix_space", False))
                if node.get("type") == "Split" and node.get("pattern"):
                    # a model-specific pre-tokenization regex (qwen2-style
                    # digit/contraction rules) — our hard-coded GPT-2 pattern
                    # would SILENTLY mis-split, so refuse and let
                    # load_tokenizer fall back to AutoTokenizer
                    custom_split = True
                for v in node.values():
                    walk(v)
            elif isinstance(node, list):
                for v in node:
                    walk(v)

        walk(tj.get("pre_tokenizer"))
        if not saw_byte_level:
            raise ValueError(
                "tokenizer.json has no ByteLevel pre-tokenizer (SentencePiece"
                "-style BPE) — native byte-level engine not applicable")
        if custom_split:
            raise ValueError(
                "tokenizer.json carries a custom Split pre-tokenization "
                "pattern; the native engine only implements the GPT-2 rule")
        return cls(model["vocab"], merges, add_prefix_space=add_prefix)

    @classmethod
    def from_pretrained_dir(cls, model_dir: str) -> "ByteLevelBPETokenizer":
        return cls.from_file(os.path.join(model_dir, "tokenizer.json"))

    # ---------------- encode ----------------

    def _initial_syms(self, word: str) -> List[int]:
        u = "".join(self._byte_enc[b] for b in word.encode("utf-8"))
        return [self._vocab[ch] for ch in u]

    def _merge_py(self, syms: List[int]) -> List[int]:
        syms = list(syms)
        while len(syms) >= 2:
            best, pos = None, -1
            for i in range(len(syms) - 1):
                r = self._rank.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best, pos = r, i
            if pos < 0:
                break
            syms[pos:pos + 2] = [int(self._merged[best])]
        return syms

    def _merge_batch_native(self, words: List[List[int]]) -> List[List[int]]:
        lib = _load_lib()
        flat = np.asarray([s for w in words for s in w], np.int32)
        offs = np.zeros(len(words) + 1, np.int64)
        np.cumsum([len(w) for w in words], out=offs[1:])
        out = np.empty_like(flat)
        out_offs = np.empty(len(words) + 1, np.int64)
        lib.bpe_encode_batch(self._handle, flat.ctypes.data, offs.ctypes.data,
                             len(words), out.ctypes.data, out_offs.ctypes.data)
        return [out[out_offs[i]:out_offs[i + 1]].tolist()
                for i in range(len(words))]

    def encode(self, text: str, add_special_tokens: bool = False) -> List[int]:
        del add_special_tokens  # base-vocab encode (see module docstring)
        if self._add_prefix_space and text and not text.startswith(" "):
            text = " " + text
        pretokens = self._pat.findall(text)
        todo, todo_syms, pending = [], [], set()
        for w in pretokens:
            if w not in self._word_cache and w not in pending:
                pending.add(w)
                todo.append(w)
                todo_syms.append(self._initial_syms(w))
        if todo:
            if self._handle is not None:
                results = self._merge_batch_native(todo_syms)
            else:
                results = [self._merge_py(s) for s in todo_syms]
            for w, ids in zip(todo, results):
                self._word_cache[w] = ids
        out: List[int] = []
        for w in pretokens:
            out.extend(self._word_cache[w])
        return out

    def __call__(self, text: str, add_special_tokens: bool = False):
        return {"input_ids": self.encode(text)}

    # ---------------- decode ----------------

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        chars = "".join(self._id_to_token[int(i)] for i in ids
                        if int(i) in self._id_to_token)
        data = bytes(self._byte_dec[c] for c in chars if c in self._byte_dec)
        return data.decode("utf-8", errors="replace")

    @property
    def vocab_size(self) -> int:
        return len(self._vocab)

    def __del__(self):
        lib = _lib
        if lib is not None and getattr(self, "_handle", None):
            try:
                lib.bpe_free(self._handle)
            except Exception:
                pass
