"""Serve an LLM over an OpenAI-compatible HTTP API.

Usage (from the repo root)::

    python -m ssp_x_vit_tpu.cli.serve_http --model /path/to/hf_llama \
        --port 8000 --max-batch 8 --prefix-cache

    # offline smoke (no checkpoint, token-id prompts):
    python -m ssp_x_vit_tpu.cli.serve_http --model tiny-random --port 8000

Then from any OpenAI SDK client::

    client = openai.OpenAI(base_url="http://127.0.0.1:8000/v1", api_key="-")
    client.completions.create(model="x", prompt="hello", max_tokens=32)

The reference has no serving entry point (its CLI surface is pruning/eval
drivers, ``/root/reference/main.py:18-62``); this is part of the rebuild's
beyond-reference serving stack (engine: llm/engine.py, API: llm/server_http.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--model", required=True,
                   help="Local HF model directory, or a tiny-random* alias "
                        "(see main_llm.py) for an offline smoke server")
    p.add_argument("--tokenizer", default=None,
                   help="Directory holding tokenizer.json (defaults to "
                        "--model when it is a directory); omit to serve "
                        "token-id prompts only")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--served-model-name", default=None,
                   help="Name reported by /v1/models (default: --model)")
    p.add_argument("--max-batch", type=int, default=4,
                   help="Concurrent decode slots")
    p.add_argument("--num-pages", type=int, default=512)
    p.add_argument("--page-size", type=int, default=64)
    p.add_argument("--max-context", type=int, default=2048)
    p.add_argument("--chunked-prefill", type=int, default=None,
                   help="Prefill chunk size (one compiled shape for all "
                        "prompt lengths); default whole-prompt buckets")
    p.add_argument("--prefix-cache", action="store_true",
                   help="Automatic prefix caching (vLLM-style)")
    p.add_argument("--kv-dtype", choices=["bf16", "int8"], default="bf16",
                   help="KV cache pool dtype (int8 = quantized KV)")
    p.add_argument("--eos-token-id", type=int, default=None,
                   help="Override the checkpoint's eos token id")
    p.add_argument("--max-tokens-cap", type=int, default=2048)
    p.add_argument("--seed", type=int, default=0,
                   help="Init seed for tiny-random models")
    return p


def _load(args):
    """(params, cfg, eos_token_id) for an HF dir or tiny-random alias."""
    sys.path.insert(0, os.getcwd())
    from main_llm import load_model

    params, cfg = load_model(args)
    eos = args.eos_token_id
    if eos is None and os.path.isdir(args.model):
        cfg_path = os.path.join(args.model, "config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                raw = json.load(f).get("eos_token_id")
            if isinstance(raw, int):
                eos = raw
            elif isinstance(raw, list) and raw:
                eos = int(raw[0])  # multi-eos: first id; others via stop_token_ids
    return params, cfg, eos


def main(argv=None):
    args = build_argparser().parse_args(argv)
    import jax.numpy as jnp

    from ssp_x_vit_tpu.llm.engine import ServingEngine
    from ssp_x_vit_tpu.llm.server_http import serve_forever
    from ssp_x_vit_tpu.llm.tokenizer import load_tokenizer

    params, cfg, eos = _load(args)

    tok_dir = args.tokenizer
    if tok_dir is None and os.path.isdir(args.model) and os.path.exists(
            os.path.join(args.model, "tokenizer.json")):
        tok_dir = args.model
    tokenizer = load_tokenizer(tok_dir) if tok_dir else None
    if tokenizer is None:
        print("[serve] no tokenizer: token-id prompts only "
              "(pass --tokenizer DIR for text prompts)")

    engine = ServingEngine(
        params, cfg, max_batch=args.max_batch, num_pages=args.num_pages,
        page_size=args.page_size, max_context=args.max_context,
        cache_dtype=jnp.int8 if args.kv_dtype == "int8" else jnp.bfloat16,
        chunked_prefill=args.chunked_prefill,
        prefix_cache=args.prefix_cache)
    try:
        serve_forever(engine, tokenizer=tokenizer, host=args.host,
                      port=args.port,
                      model_name=args.served_model_name or args.model,
                      eos_token_id=eos, max_tokens_cap=args.max_tokens_cap)
    finally:
        engine.shutdown()


if __name__ == "__main__":
    main()
