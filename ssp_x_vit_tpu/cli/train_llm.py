"""Finetune / recovery-train an LLM (CE or knowledge distillation).

The reference never trains LLMs (``/root/reference/main.py`` is prune+eval
only); this driver closes the prune -> RECOVER -> serve loop from the
command line::

    # continue-pretrain / finetune on a token stream (synthetic fallback)
    python -m ssp_x_vit_tpu.cli.train_llm --model /path/hf_dir --steps 200 \
        --batch-size 4 --seq-len 512 --lr 1e-4 --checkpoint-dir /tmp/ck

    # KD recovery of a pruned model against its dense teacher
    python -m ssp_x_vit_tpu.cli.train_llm --model /path/pruned_dir \
        --teacher /path/dense_dir --steps 200 --save-model /tmp/recovered

Offline smoke: ``--model tiny-random --steps 4 --synthetic-data``.
Checkpoints are orbax (params, opt_state, update); rerunning with the same
``--checkpoint-dir`` resumes where the previous run stopped.
"""

from __future__ import annotations

import argparse
import functools
import json
import logging
import os
import sys

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--model", default=None,
                   help="Local HF dir, native save_llm_model dir, or a "
                        "tiny-random* alias (required unless --init-json)")
    p.add_argument("--teacher", default=None,
                   help="Dense teacher (dir or alias): enables KD recovery "
                        "(CE + T^2*KL)")
    p.add_argument("--kd-alpha", type=float, default=0.5)
    p.add_argument("--kd-temperature", type=float, default=2.0)
    p.add_argument("--steps", type=int, default=100,
                   help="Optimizer updates")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--seq-len", type=int, default=512)
    p.add_argument("--accum", type=int, default=1,
                   help="Gradient-accumulation microbatches per update")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup", type=int, default=0)
    p.add_argument("--schedule", choices=["cosine", "linear", "constant"],
                   default="cosine")
    p.add_argument("--weight-decay", type=float, default=0.01)
    p.add_argument("--grad-clip", type=float, default=1.0)
    p.add_argument("--compute-dtype", choices=["bfloat16", "float32"],
                   default="bfloat16")
    p.add_argument("--no-remat", action="store_true")
    p.add_argument("--data", default=None,
                   help="Local dataset dir for load_wikitext2; default "
                        "synthetic token stream")
    p.add_argument("--data-bin", default=None,
                   help="Pre-tokenized uint16 token-id file (memmapped; "
                        "scripts/prepare_code_corpus.py writes one)")
    p.add_argument("--init-json", default=None,
                   help="JSON dict of LlamaConfig fields: fresh-init a model "
                        "of that shape (bf16) instead of loading --model")
    p.add_argument("--synthetic-data", action="store_true",
                   help="Force the deterministic synthetic stream")
    p.add_argument("--num-tokens", type=int, default=None,
                   help="Training tokens to draw (default: enough for "
                        "steps*accum batches)")
    p.add_argument("--eval-every", type=int, default=0,
                   help="Perplexity eval cadence (updates); 0 disables")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-every", type=int, default=100)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--save-model", default=None,
                   help="Write the trained model here when done")
    p.add_argument("--save-format", choices=["native", "hf"],
                   default="native")
    p.add_argument("--seed", type=int, default=0)
    return p


def _load_any(name: str, seed: int):
    sys.path.insert(0, os.getcwd())
    from main_llm import load_model

    ns = argparse.Namespace(model=name, seed=seed)
    return load_model(ns)


def _token_batches(args, cfg):
    """Deterministic [b, s+1] microbatch array (restartable for resume)."""
    from ssp_x_vit_tpu.llm.datasets import (load_wikitext2,
                                            synthetic_token_stream,
                                            tokenize_corpus)

    n_micro = args.steps * args.accum
    need = args.num_tokens or n_micro * args.batch_size * (args.seq_len + 1)
    ids = None
    if args.data_bin:
        ids = np.memmap(args.data_bin, dtype=np.uint16, mode="r")
        per = args.batch_size * (args.seq_len + 1)
        n = min(n_micro, ids.size // per)
        if n == 0:
            raise SystemExit(f"need >= {per} tokens/microbatch, got {ids.size}")

        def gen():
            # stream windows off the memmap; wrap around if the corpus is
            # shorter than the requested schedule (multi-epoch)
            for k in range(n_micro):
                off = (k % n) * per
                yield np.asarray(ids[off:off + per], np.int32).reshape(
                    args.batch_size, args.seq_len + 1)

        # held-out eval: sibling val.bin (distinct files) when present
        val_bin = os.path.join(os.path.dirname(args.data_bin), "val.bin")
        if os.path.exists(val_bin):
            ev = np.memmap(val_bin, dtype=np.uint16, mode="r")
        else:
            ev = ids
        return gen(), np.asarray(ev[-64 * (args.seq_len + 1):], np.int32)
    if not args.synthetic_data and args.data:
        try:
            texts = load_wikitext2(args.data)
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(args.data)
            ids = tokenize_corpus(texts, tok)
        except Exception as e:  # noqa: BLE001 — offline fallback chain
            logging.warning(f"dataset load failed ({e}); synthetic fallback")
    if ids is None:
        ids = synthetic_token_stream(need, cfg.vocab_size, seed=args.seed)
    ids = np.asarray(ids).reshape(-1)
    per = args.batch_size * (args.seq_len + 1)
    n = min(n_micro, ids.size // per)
    if n == 0:
        raise SystemExit(f"need >= {per} tokens for one microbatch, "
                         f"got {ids.size}")
    batches = ids[: n * per].reshape(n, args.batch_size, args.seq_len + 1)
    return batches, ids


def main(argv=None):
    args = build_argparser().parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    for noisy in ("orbax", "absl", "jax"):  # checkpoint-internals INFO spam
        logging.getLogger(noisy).setLevel(logging.WARNING)

    from ssp_x_vit_tpu.llm.trainer import TrainConfig, Trainer

    if args.init_json:
        import jax
        import jax.numpy as jnp

        from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params

        if os.path.exists(args.init_json):
            with open(args.init_json) as f:
                cfg = LlamaConfig(**json.load(f))
        else:
            cfg = LlamaConfig(**json.loads(args.init_json))
        params = init_llama_params(jax.random.PRNGKey(args.seed), cfg,
                                   dtype=jnp.bfloat16)
    else:
        if not args.model:
            raise SystemExit("pass --model or --init-json")
        params, cfg = _load_any(args.model, args.seed)
    tc = TrainConfig(
        learning_rate=args.lr, total_steps=args.steps,
        warmup_steps=args.warmup, schedule=args.schedule,
        weight_decay=args.weight_decay, grad_clip=args.grad_clip,
        accum_steps=args.accum, compute_dtype=args.compute_dtype,
        remat=not args.no_remat, log_every=args.log_every,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every)

    step_factory = None
    if args.teacher:
        from ssp_x_vit_tpu.llm.train import make_distill_train_step

        t_params, t_cfg = _load_any(args.teacher, args.seed)
        if t_cfg.vocab_size != cfg.vocab_size:
            raise SystemExit("teacher and student must share a vocab")
        step_factory = functools.partial(
            make_distill_train_step, t_params, t_cfg,
            alpha=args.kd_alpha, temperature=args.kd_temperature)

    batches, stream = _token_batches(args, cfg)
    eval_tokens = stream[-4 * (args.seq_len + 1):] if args.eval_every else None

    trainer = Trainer(cfg, tc, step_factory=step_factory)
    params, history = trainer.fit(
        params, batches if args.data_bin else list(batches),
        eval_tokens=eval_tokens,
        eval_every=args.eval_every, eval_seq_len=args.seq_len)
    if history:
        final = [h for h in history if "loss" in h]
        if final:
            logging.info(f"[SUMMARY] {{\"final_loss\": {final[-1]['loss']}, "
                         f"\"updates\": {final[-1]['update']}}}")

    if args.save_model:
        from ssp_x_vit_tpu.llm.checkpoints import (export_hf_llama,
                                                   save_llm_model)

        fn = export_hf_llama if args.save_format == "hf" else save_llm_model
        path = fn(args.save_model, params, cfg)
        logging.info(f"[ARTIFACT] {args.save_format} model -> {path}")


if __name__ == "__main__":
    main()
