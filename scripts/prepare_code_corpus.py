"""Build an offline code-LM corpus from the host's own Python sources.

Zero-egress stand-in for a real pretraining corpus (the reference evaluates
on wikitext2/C4, /root/reference/src/main.py:48-61 — unavailable here): the
~500 MB of Python text in site-packages + the stdlib is real, highly
structured natural text for a language model. Trained checkpoints from this
corpus retire the random-weights caveats on speculative-decoding acceptance,
quantization ppl deltas, and pruning quality curves (VERDICT r3 #2).

Outputs under --out (default artifacts/code_corpus/, gitignored):
  tokenizer.json   byte-level BPE (HF tokenizers format; our native
                   llm/tokenizer.py loads it for serving demos)
  train.bin        uint16 token ids (memmap-able)
  val.bin          held-out tail (distinct FILES, not a split of a stream)
  meta.json        stats

  python scripts/prepare_code_corpus.py [--vocab 8192] [--max-mb 400]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOTS = (
    "/opt/venv/lib/python3.12/site-packages",
    "/usr/local/lib/python3.12",
)
EOT = "<|endoftext|>"


def list_files(max_mb: float):
    files = []
    for root in ROOTS:
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames.sort()
            for f in sorted(filenames):
                if f.endswith(".py"):
                    p = os.path.join(dirpath, f)
                    try:
                        sz = os.path.getsize(p)
                    except OSError:
                        continue
                    if 200 <= sz <= 1_000_000:  # skip stubs + generated blobs
                        files.append((p, sz))
    rng = np.random.default_rng(0)
    rng.shuffle(files)
    budget = max_mb * 1e6
    out, total = [], 0
    for p, sz in files:
        if total + sz > budget:
            continue
        out.append(p)
        total += sz
    return out, total


def read(p):
    try:
        with open(p, encoding="utf-8", errors="ignore") as f:
            return f.read()
    except OSError:
        return ""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/code_corpus")
    ap.add_argument("--vocab", type=int, default=8192)
    ap.add_argument("--max-mb", type=float, default=400.0)
    ap.add_argument("--val-files", type=int, default=64)
    ap.add_argument("--tokenizer-sample-mb", type=float, default=40.0)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    t0 = time.time()
    files, total_bytes = list_files(args.max_mb)
    print(f"{len(files)} files, {total_bytes/1e6:.0f} MB text")

    tok_path = os.path.join(args.out, "tokenizer.json")
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    if not os.path.exists(tok_path):
        sample, acc = [], 0
        for p in files:
            txt = read(p)
            sample.append(txt)
            acc += len(txt)
            if acc > args.tokenizer_sample_mb * 1e6:
                break
        tok = Tokenizer(models.BPE())
        tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
        tok.decoder = decoders.ByteLevel()
        trainer = trainers.BpeTrainer(
            vocab_size=args.vocab - 1,  # reserve the last id for EOT
            special_tokens=[],
            initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
        tok.train_from_iterator(sample, trainer)
        tok.add_special_tokens([EOT])
        tok.save(tok_path)
        print(f"tokenizer trained ({time.time()-t0:.0f}s)")
    tok = Tokenizer.from_file(tok_path)
    vocab_size = tok.get_vocab_size()
    eot_id = tok.token_to_id(EOT)
    assert vocab_size <= 65536, "uint16 storage"

    def encode_split(paths, name):
        out_path = os.path.join(args.out, f"{name}.bin")
        n_tok = 0
        with open(out_path, "wb") as out:
            B = 512  # files per encode_batch call
            for i in range(0, len(paths), B):
                texts = [read(p) for p in paths[i:i + B]]
                encs = tok.encode_batch([t for t in texts if t])
                for e in encs:
                    ids = np.asarray(e.ids + [eot_id], np.uint16)
                    out.write(ids.tobytes())
                    n_tok += ids.size
                if (i // B) % 20 == 0:
                    print(f"  {name}: {i+B}/{len(paths)} files, "
                          f"{n_tok/1e6:.1f}M tokens, {time.time()-t0:.0f}s",
                          flush=True)
        return n_tok

    val_files = files[: args.val_files]
    train_files = files[args.val_files:]
    n_val = encode_split(val_files, "val")
    n_train = encode_split(train_files, "train")

    meta = {
        "vocab_size": vocab_size, "eot_id": eot_id,
        "train_tokens": n_train, "val_tokens": n_val,
        "files": len(files), "bytes": total_bytes,
        "bytes_per_token": round(total_bytes / max(1, n_train + n_val), 3),
        "dtype": "uint16",
    }
    with open(os.path.join(args.out, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta))


if __name__ == "__main__":
    sys.exit(main())
