"""LLM corpora + calibration splitting
(reference src/datasets.py, src/utilities.py:153-168 get_calibration).

Loaders try the HF datasets cache / a local disk path first and fall back to a
deterministic synthetic token stream offline (structured: repeated n-gram
patterns so perplexity responds sensibly to model damage).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np


def load_wikitext2(local_dir: Optional[str] = None):
    """wikitext-2 test split texts, or None offline (reference src/datasets.py:4-17)."""
    try:
        from datasets import load_dataset, load_from_disk

        if local_dir and os.path.exists(local_dir):
            return load_from_disk(local_dir)["text"]
        return load_dataset("Salesforce/wikitext", "wikitext-2-raw-v1", split="test")["text"]
    except Exception as e:
        print(f"[INFO] wikitext2 unavailable ({type(e).__name__}); use synthetic_token_stream")
        return None


def load_c4(local_dir: Optional[str] = None, split: str = "validation"):
    """C4 en val[:1100] (reference src/datasets.py:19-56, pinned revision)."""
    try:
        from datasets import load_dataset, load_from_disk

        if local_dir and os.path.exists(local_dir):
            return load_from_disk(local_dir)["text"]
        sel = "train[:1000]" if split == "train" else "validation[:1100]"
        return load_dataset("allenai/c4", "en", split=sel)["text"]
    except Exception as e:
        print(f"[INFO] c4 unavailable ({type(e).__name__}); use synthetic_token_stream")
        return None


def load_fineweb_edu(local_dir: Optional[str] = None):
    """fineweb-edu sample-10BT[:1100] (reference src/datasets.py:58-75)."""
    try:
        from datasets import load_dataset, load_from_disk

        if local_dir and os.path.exists(local_dir):
            return load_from_disk(local_dir)["text"]
        return load_dataset("HuggingFaceFW/fineweb-edu", name="sample-10BT",
                            split="train[:1100]")["text"]
    except Exception as e:
        print(f"[INFO] fineweb-edu unavailable ({type(e).__name__}); use synthetic_token_stream")
        return None


def synthetic_token_stream(num_tokens: int, vocab_size: int, seed: int = 0) -> np.ndarray:
    """Deterministic structured token stream: a Markov-ish mixture of repeated
    n-grams over a small sub-vocabulary, so NLL is far below uniform and
    degrades when the model is damaged — a usable offline stand-in for
    perplexity-driven search."""
    rng = np.random.default_rng(seed)
    n_patterns = 64
    pat_len = 16
    sub_vocab = rng.integers(0, vocab_size, size=512)
    patterns = [sub_vocab[rng.integers(0, 512, size=pat_len)] for _ in range(n_patterns)]
    out = np.empty(num_tokens, np.int32)
    i = 0
    while i < num_tokens:
        p = patterns[int(rng.integers(0, n_patterns))]
        n = min(pat_len, num_tokens - i)
        out[i : i + n] = p[:n]
        i += n
    return out.reshape(1, -1)


def tokenize_corpus(texts: List[str], tokenizer) -> np.ndarray:
    """'\\n\\n'.join(texts) tokenized without special tokens
    (reference main.py:93-95, src/utilities.py:158-161)."""
    ids = tokenizer("\n\n".join(texts), add_special_tokens=False)["input_ids"]
    return np.asarray(ids, np.int32).reshape(1, -1)


def get_calibration(input_ids: np.ndarray, num_samples: int, seq_len: int = 2048
                    ) -> List[np.ndarray]:
    """Split a token stream into ``num_samples`` windows of ``seq_len``
    (reference src/utilities.py:153-168)."""
    flat = np.asarray(input_ids).reshape(-1)
    out = []
    for i in range(num_samples):
        chunk = flat[i * seq_len : (i + 1) * seq_len]
        if chunk.size < seq_len:
            break
        out.append(chunk.reshape(1, seq_len))
    return out
