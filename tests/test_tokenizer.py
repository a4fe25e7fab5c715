"""Native byte-level BPE vs the HF `tokenizers` Rust library, head-to-head.

Trains a byte-level BPE offline (no downloads), saves its tokenizer.json,
and asserts our native/python encode+decode match the production library
exactly on the same file."""

import os

import numpy as np
import pytest

tokenizers = pytest.importorskip("tokenizers")

from ssp_x_vit_tpu.llm.tokenizer import (
    ByteLevelBPETokenizer, bytes_to_unicode, native_available,
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs 0123456789",
    "It's the tokenizer's job -- isn't it? We'll see...",
    "def f(x):\n    return x * 2  # comment\n",
    "naive cafe uber strasse über straße élève",
    "multiple   spaces\tand\nnewlines   everywhere",
] * 4

TEXTS = [
    "the quick brown fox",
    "It's a test -- isn't it?",
    "  leading and trailing  ",
    "tabs\tand\nnewlines",
    "unicode: über straße élève naïve",
    "digits 123 and 456789 mixed2gether",
    "",
    "x",
]


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=420, show_progress=False,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(CORPUS, trainer)
    path = str(tmp_path_factory.mktemp("tok") / "tokenizer.json")
    tok.save(path)
    return tok, path


def test_byte_alphabet_roundtrip():
    enc = bytes_to_unicode()
    assert len(enc) == 256 and len(set(enc.values())) == 256
    dec = {c: b for b, c in enc.items()}
    data = bytes(range(256))
    assert bytes(dec[enc[b]] for b in data) == data


def test_encode_matches_hf_tokenizers(trained):
    hf, path = trained
    ours = ByteLevelBPETokenizer.from_file(path)
    for text in TEXTS:
        expect = hf.encode(text).ids
        got = ours.encode(text)
        assert got == expect, f"{text!r}: {got} != {expect}"


def test_decode_roundtrip_matches_hf(trained):
    hf, path = trained
    ours = ByteLevelBPETokenizer.from_file(path)
    for text in TEXTS:
        ids = ours.encode(text)
        assert ours.decode(ids) == hf.decode(ids)
        assert ours.decode(ids) == text


def test_python_fallback_matches_native(trained):
    _, path = trained
    ours = ByteLevelBPETokenizer.from_file(path)
    for text in TEXTS:
        native = ours.encode(text)
        ours._word_cache.clear()
        handle, ours._handle = ours._handle, None  # force python path
        try:
            py = ours.encode(text)
        finally:
            ours._handle = handle
            ours._word_cache.clear()
        assert native == py


def test_native_engine_builds():
    # informational: the toolchain is baked into the image, so the native
    # path should actually be live in CI runs of this repo
    assert native_available()
