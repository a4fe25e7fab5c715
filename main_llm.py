"""LLM pruning CLI — TPU-native counterpart of the reference ``main.py``
(reference main.py:18-253): same flags and flow (method dispatch, sparsity
sweeps -1/-2, pruning-time measurement, perplexity / inference / downstream /
qualitative evaluation hooks).

Offline operation: ``--model tiny-random`` builds a small random Llama-class
model, and ``--synthetic-data`` (or any dataset-load failure) substitutes
deterministic structured token streams so every pruning method and the
perplexity loop remain exercisable with zero egress.

Usage:
  python main_llm.py --model /path/to/llama-dir --pruning_method 2ssp \
      --sparsity_rate 0.5 --evaluate_perplexity
  python main_llm.py --model tiny-random --pruning_method blockpruner \
      --sparsity_rate 0.25 --evaluate_perplexity --synthetic-data
"""

import argparse
import json
import logging
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(description="Pruning of transformer models (TPU-native)")
    parser.add_argument('--model', type=str, required=True,
                        help="Local HF model directory, or 'tiny-random' for an offline test model")
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--cache_dir', type=str, required=False)
    parser.add_argument('--dense', action='store_true',
                        help="Load the original dense model without pruning")
    parser.add_argument('--pruning_method', type=str,
                        choices=['2ssp', 'window_based', 'shortgpt', 'blockpruner',
                                 'evopress', 'slicegpt'])
    parser.add_argument('--sparsity_rate', type=float,
                        help="0..1 target sparsity; -1 sweeps i/N; -2 sweeps 25/37.5/50%%")
    parser.add_argument('--main_table_results', action='store_true')
    parser.add_argument('--evaluate_inference', action='store_true')
    parser.add_argument('--evaluate_downstream', action='store_true')
    parser.add_argument('--task-pack', type=str, default=None,
                        help='offline task-pack dir (llm/taskpack.py) used '
                             'for downstream eval when no lm-eval harness '
                             'is importable; $SSP_X_VIT_TASK_PACK also works')
    parser.add_argument('--evaluate_perplexity', action='store_true')
    parser.add_argument('--evaluate_qualitative', action='store_true')
    parser.add_argument('--ablation', action='store_true',
                        help="Run the ablation study experiments")
    parser.add_argument('--ablation-quick', action='store_true',
                        help="Shrink ablation sweeps for smoke runs")
    parser.add_argument('--local_datasets', action='store_true',
                        help="Use local datasets stored in the './data/' folder")
    parser.add_argument('--synthetic-data', action='store_true',
                        help="Force deterministic synthetic token streams (offline)")
    parser.add_argument('--seq-len', type=int, default=2048)
    parser.add_argument('--num-calibration', type=int, default=256)
    parser.add_argument('--num-calibration-2ssp', type=int, default=32)
    parser.add_argument('--evopress-generations', type=int, default=None,
                        help="Override EvoPress generation count (for smoke runs)")
    parser.add_argument('--quantize', type=str, default='none',
                        choices=('none', 'int8', 'int4'),
                        help='weight-only quantization applied to every '
                             'evaluated model (llm/quant.py; int8 = per-'
                             'channel epilogue scales, int4 = packed pallas '
                             'kernel). Composes with any pruning method.')
    parser.add_argument('--w8a8', action='store_true',
                        help='with --quantize int8: evaluate with native '
                             'int8-MXU W8A8 matmuls (dynamic per-token '
                             'activation scales; measured 1.38x on the '
                             'b=4 s=2048 perplexity workload, '
                             'docs/tpu_notes.md). With --quantize int4 the '
                             'packed-int4 matmuls and routed-expert einsums '
                             'stay weight-only; W8A8 engages only on int8-'
                             'quantized layers (e.g. lm_head) — a warning '
                             'states the reduced scope.')
    parser.add_argument('--save-model', type=str, default=None,
                        help='directory to persist the pruned model '
                             '(materialized weights, no gates); sparsity '
                             'sweeps write per-rate subdirectories. Mirrors '
                             'the reference save_pretrained flow '
                             '(src/pruning.py:286-290).')
    parser.add_argument('--save-format', type=str, default='native',
                        choices=('native', 'hf'),
                        help='native = model.npz + config.json '
                             '(save_llm_model: serves any pytree incl. '
                             'attention-depth-pruned); hf = config.json + '
                             'model.safetensors for transformers '
                             'from_pretrained (export_hf_llama)')
    parser.add_argument('--backend', type=str, default='default',
                        choices=['default', 'cpu', 'tpu'])
    parser.add_argument('--logging', type=str, default='INFO',
                        choices=['DEBUG', 'INFO', 'WARNING', 'ERROR', 'CRITICAL'])
    return parser.parse_args()


TINY_RANDOM = dict(vocab_size=512, hidden_size=64, num_layers=6, num_heads=4,
                   num_kv_heads=4, intermediate_size=172)


def load_model(args):
    import jax
    import jax.numpy as jnp

    from ssp_x_vit_tpu.llm.checkpoints import load_hf_llama
    from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params

    if os.path.isdir(args.model):
        cfg_path = os.path.join(args.model, "config.json")
        model_type = None
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                model_type = json.load(f).get("model_type")
        if model_type == "deepseek_v3":
            from ssp_x_vit_tpu.llm.deepseek import load_hf_deepseek

            return load_hf_deepseek(args.model)
        if os.path.exists(os.path.join(args.model, "model.npz")):
            # native npz artifacts (save_llm_model / save_deepseek_model) —
            # deepseek configs are the ones carrying kv_lora_rank
            with open(cfg_path) as f:
                if "kv_lora_rank" in json.load(f):
                    from ssp_x_vit_tpu.llm.deepseek import load_deepseek_model

                    return load_deepseek_model(args.model)
            from ssp_x_vit_tpu.llm.checkpoints import load_llm_model

            return load_llm_model(args.model)
        return load_hf_llama(args.model)
    if args.model == "tiny-random":
        cfg = LlamaConfig(**TINY_RANDOM)
        return init_llama_params(jax.random.PRNGKey(args.seed), cfg, dtype=jnp.float32), cfg
    if args.model == "tiny-random-phi":
        cfg = LlamaConfig(**TINY_RANDOM, model_type="phi", qkv_bias=True, rotary_dim=8)
        return init_llama_params(jax.random.PRNGKey(args.seed), cfg, dtype=jnp.float32), cfg
    if args.model == "tiny-random-opt":
        cfg = LlamaConfig(**TINY_RANDOM, model_type="opt", qkv_bias=True,
                          tie_embeddings=True, max_position_embeddings=512)
        return init_llama_params(jax.random.PRNGKey(args.seed), cfg, dtype=jnp.float32), cfg
    if args.model == "tiny-random-gemma":
        cfg = LlamaConfig(**TINY_RANDOM, model_type="gemma",
                          hidden_act="gelu_tanh", scale_embeddings=True,
                          tie_embeddings=True)
        return init_llama_params(jax.random.PRNGKey(args.seed), cfg, dtype=jnp.float32), cfg
    if args.model == "tiny-random-gemma2":
        cfg = LlamaConfig(**TINY_RANDOM, model_type="gemma2",
                          hidden_act="gelu_tanh", scale_embeddings=True,
                          tie_embeddings=True, sliding_window=64,
                          window_layers=tuple(range(0, TINY_RANDOM["num_layers"], 2)),
                          attn_softcap=50.0, final_softcap=30.0)
        return init_llama_params(jax.random.PRNGKey(args.seed), cfg, dtype=jnp.float32), cfg
    if args.model == "tiny-random-qwen3":
        cfg = LlamaConfig(**TINY_RANDOM, model_type="qwen3", qk_norm=True)
        return init_llama_params(jax.random.PRNGKey(args.seed), cfg, dtype=jnp.float32), cfg
    if args.model == "tiny-random-deepseek":
        from ssp_x_vit_tpu.llm.deepseek import (DeepseekConfig,
                                                init_deepseek_params)

        dcfg = DeepseekConfig(
            vocab_size=512, hidden_size=64, num_layers=4, num_heads=4,
            q_lora_rank=24, kv_lora_rank=32, qk_nope_head_dim=16,
            qk_rope_head_dim=8, v_head_dim=16, intermediate_size=172,
            moe_intermediate_size=48, n_routed_experts=4, n_shared_experts=1,
            num_experts_per_tok=2, first_k_dense_replace=1)
        return init_deepseek_params(jax.random.PRNGKey(args.seed), dcfg), dcfg
    if args.model == "tiny-random-deepseek-dense":
        # all-dense MLA variant: the 2SSP target (stage-1 needs dense GLUs)
        from ssp_x_vit_tpu.llm.deepseek import (DeepseekConfig,
                                                init_deepseek_params)

        dcfg = DeepseekConfig(
            vocab_size=512, hidden_size=64, num_layers=4, num_heads=4,
            q_lora_rank=24, kv_lora_rank=32, qk_nope_head_dim=16,
            qk_rope_head_dim=8, v_head_dim=16, intermediate_size=172,
            n_routed_experts=0)
        return init_deepseek_params(jax.random.PRNGKey(args.seed), dcfg), dcfg
    raise SystemExit("--model must be a local HF directory, 'tiny-random', "
                     "'tiny-random-phi', 'tiny-random-opt', "
                     "'tiny-random-gemma', 'tiny-random-gemma2', "
                     "'tiny-random-qwen3', 'tiny-random-deepseek' or "
                     "'tiny-random-deepseek-dense'; "
                     f"got {args.model}")


def load_corpora(args, cfg):
    """(wikitext_ids, c4_val_ids, fineweb_ids, c4_train_ids) token streams."""
    from ssp_x_vit_tpu.llm import datasets as D

    if not args.synthetic_data and os.path.isdir(args.model):
        try:
            from ssp_x_vit_tpu.llm.tokenizer import load_tokenizer

            tok = load_tokenizer(args.model)
            base = "./data" if args.local_datasets else None
            wik = D.load_wikitext2(base and f"{base}/wikitext2")
            c4v = D.load_c4(base and f"{base}/c4_val", split="validation")
            fwe = D.load_fineweb_edu(base and f"{base}/fineweb_edu")
            c4t = D.load_c4(base and f"{base}/c4_train", split="train")
            if all(x is not None for x in (wik, c4v, fwe, c4t)):
                return (D.tokenize_corpus(wik, tok), D.tokenize_corpus(c4v, tok),
                        D.tokenize_corpus(fwe[:500], tok), D.tokenize_corpus(c4t, tok))
        except Exception as e:
            logging.warning(f"Real datasets unavailable ({e}); falling back to synthetic")

    logging.info("Using deterministic synthetic token streams")
    n = args.seq_len * (args.num_calibration + 8)

    def mk(s):
        return D.synthetic_token_stream(n, cfg.vocab_size, seed=s)

    return mk(1), mk(2), mk(3), mk(4)


def main():
    args = parse_args()
    logging.basicConfig(level=getattr(logging, args.logging.upper()),
                        format='%(asctime)s - %(levelname)s - %(message)s', datefmt='%H:%M:%S')
    if args.backend != "default":
        import jax

        jax.config.update("jax_platforms", args.backend)

    from ssp_x_vit_tpu.utils.seeding import set_seed
    from ssp_x_vit_tpu.llm import datasets as D
    from ssp_x_vit_tpu.llm import pruning as P
    from ssp_x_vit_tpu.llm.evaluation import (evaluate_perplexity, evaluation_ppl,
                                              evaluate_inference_time)

    set_seed(args.seed)
    params, cfg = load_model(args)
    logging.info(f"Model: {getattr(cfg, 'model_type', 'deepseek_v3')} "
                 f"L={cfg.num_layers} d={cfg.hidden_size} "
                 f"f={cfg.intermediate_size}")

    from ssp_x_vit_tpu.llm.deepseek import DeepseekConfig as _DeepseekConfig

    is_deepseek = isinstance(cfg, _DeepseekConfig)
    if is_deepseek:
        # MLA supports the reference pruning methods (2ssp on dense-GLU
        # configs, depth baselines on any config — llm/pruning_deepseek.py),
        # perplexity/latency/downstream/qualitative evaluation, int8/int4
        # quantization (int4 keeps routed expert stacks at int8 — no nibble
        # layout for the expert einsum), w8a8, and --save-model. SliceGPT is
        # refused (the rotation does not commute with the low-rank
        # kv_a/kv_b factorization); the ablation suite is a llama-layout
        # study (zero-scatter indices assume per-head q/k/v kernels).
        unsupported = [f for f, on in (
            ("--pruning_method slicegpt", args.pruning_method == "slicegpt"),
            ("--pruning_method 2ssp on a MoE deepseek (stage-1 FFN width "
             "needs dense GLU MLPs; use the depth baselines or a "
             "first_k_dense_replace==num_layers config)",
             args.pruning_method == "2ssp" and cfg.n_routed_experts > 0),
            ("--ablation", args.ablation)) if on]
        if unsupported:
            raise SystemExit("unsupported for deepseek models: "
                             f"{unsupported} (slicegpt rotation does not "
                             "commute with the MLA factorization; the "
                             "ablation suite assumes the llama layout)")

    wikitext_ids, c4_val_ids, fineweb_ids, c4_train_ids = load_corpora(args, cfg)
    calibration = D.get_calibration(c4_train_ids, args.num_calibration, seq_len=args.seq_len)
    calibration_2ssp = calibration[: args.num_calibration_2ssp]
    first_sample = calibration[0]

    def run_evals(p, c, attn_gate=None, mlp_gate=None):
        from ssp_x_vit_tpu.llm.slicegpt import SlicedLlamaConfig, evaluate_perplexity_sliced

        if args.quantize != 'none' and not isinstance(c, SlicedLlamaConfig):
            from ssp_x_vit_tpu.llm.quant import (
                quantize_deepseek_params_int4, quantize_deepseek_params_int8,
                quantize_llm_params_int4, quantize_llm_params_int8,
            )

            q = (quantize_llm_params_int8 if args.quantize == 'int8'
                 else quantize_llm_params_int4)
            if is_deepseek:
                q = (quantize_deepseek_params_int8 if args.quantize == 'int8'
                     else quantize_deepseek_params_int4)
            p = q(p, c)
            logging.info(f"Evaluating {args.quantize}-quantized weights")
            if args.w8a8:
                from ssp_x_vit_tpu.ops import dispatch

                dispatch.set_w8a8_enabled(True)
                if args.quantize == 'int4':
                    # mm_quant's int4 branch (ops/common.py) and the routed-
                    # expert einsums are weight-only; only int8-quantized
                    # layers (lm_head) pick up activation quantization —
                    # make the scope explicit so measurements aren't
                    # misattributed to a full-W8A8 run.
                    logging.warning(
                        "W8A8 with --quantize int4: activation quantization "
                        "applies only to int8-quantized layers (lm_head); "
                        "int4 matmuls and expert einsums stay weight-only")
                else:
                    logging.info("W8A8 mode: native int8-MXU matmuls")
        if isinstance(c, SlicedLlamaConfig):
            if args.evaluate_perplexity or args.main_table_results:
                ppl = evaluate_perplexity_sliced(p, c, wikitext_ids, seq_len=args.seq_len)
                logging.info(f"Perplexity (wikitext2): {ppl}")
            return
        if args.evaluate_inference:
            ms = evaluate_inference_time(p, c, first_sample)
            logging.info(f"Average Inference Time: {ms:.3f} ms")
        if args.evaluate_downstream:
            from ssp_x_vit_tpu.llm.downstream import evaluation_downstream

            evaluation_downstream(p, c, args.model, task_pack=args.task_pack)
        if args.main_table_results:
            evaluation_ppl(p, c, wikitext_ids, c4_val_ids, fineweb_ids, seq_len=args.seq_len,
                           attn_gate=attn_gate, mlp_gate=mlp_gate)
        if args.evaluate_perplexity:
            ppl = evaluate_perplexity(p, c, wikitext_ids, seq_len=args.seq_len,
                                      attn_gate=attn_gate, mlp_gate=mlp_gate)
            logging.info(f"Perplexity (wikitext2): {ppl}")
        if args.evaluate_qualitative:
            from ssp_x_vit_tpu.llm.generate import qualitative_results

            qualitative_results(p, c, args.model, max_length=128)

    def save_artifact(p, c, suffix=None):
        """Persist a materialized model per --save-format; HF-unreachable
        forms (sliced shortcut matrices, attention-removed blocks) warn and
        skip instead of aborting the run."""
        from ssp_x_vit_tpu.llm.checkpoints import export_hf_llama, save_llm_model
        from ssp_x_vit_tpu.llm.slicegpt import SlicedLlamaConfig

        out = args.save_model
        if suffix:
            out = os.path.join(out, suffix)
        if isinstance(c, SlicedLlamaConfig):
            logging.warning("--save-model skipped: sliced models carry "
                            "shortcut matrices with no HF/native encoding "
                            "(re-slice from the saved rotation instead)")
            return
        try:
            if is_deepseek:
                from ssp_x_vit_tpu.llm.deepseek import (export_hf_deepseek,
                                                        save_deepseek_model)

                fn = (export_hf_deepseek if args.save_format == 'hf'
                      else save_deepseek_model)
            else:
                fn = (export_hf_llama if args.save_format == 'hf'
                      else save_llm_model)
            path = fn(out, p, c)
            logging.info(f"[ARTIFACT] {args.save_format} model -> {path}")
        except ValueError as e:
            logging.warning(f"--save-model skipped: {e}")

    def materialize_masked(p, c, attn_mask, mlp_mask):
        """Block masks -> physical weights: whole-block removal where both
        submodules fall, attention-only depth materialization (with indices
        remapped to the surviving layers) where only attention does."""
        am = [bool(x) for x in np.asarray(attn_mask).reshape(-1)]
        mm = [bool(x) for x in np.asarray(mlp_mask).reshape(-1)]
        both = [i for i, (a, m) in enumerate(zip(am, mm)) if a and m]
        attn_only = [i for i, (a, m) in enumerate(zip(am, mm)) if a and not m]
        mlp_only = [i for i, (a, m) in enumerate(zip(am, mm)) if m and not a]
        if mlp_only:
            raise ValueError("MLP-only block masks have no materialized form")
        p, c = P.materialize_llm_block_removal(p, c, both)
        keep = [i for i in range(len(am)) if i not in set(both)]
        remap = {old: new for new, old in enumerate(keep)}
        if attn_only:
            p, c = P.materialize_llm_depth_pruning(
                p, c, [remap[i] for i in attn_only])
        return p, c

    if args.dense:
        logging.info("Dense model evaluation")
        run_evals(params, cfg)
        if args.save_model:
            save_artifact(params, cfg)

    if args.ablation:
        from ssp_x_vit_tpu.llm.ablations import run_ablations

        run_ablations(params, cfg, c4_train_ids, wikitext_ids, calibration_2ssp,
                      seq_len=args.seq_len, quick=args.ablation_quick)

    if args.pruning_method is None:
        return

    L = cfg.num_layers
    sr = args.sparsity_rate
    if sr is not None and int(round(sr)) == -1:
        pruning_rates = [i / L for i in range(1, L - 1)]
    elif sr is not None and int(round(sr)) == -2:
        pruning_rates = [0.25, 0.375, 0.5]
    else:
        pruning_rates = [sr]

    for target_sparsity in pruning_rates:
        set_seed(args.seed)
        start_time = time.time()

        work_params, work_cfg = params, cfg
        attn_mask = mlp_mask = None

        if args.pruning_method in ("window_based", "shortgpt", "blockpruner", "evopress"):
            tsb = target_sparsity * L
            if not float(tsb).is_integer():
                logging.warning(f"Invalid sparsity rate for {args.pruning_method}: must be a "
                                f"multiple of 1/{L} since model has {L} blocks.")
                tsb = int(math.ceil(tsb))
                logging.warning(f"Rounding to next valid sparsity rate: {tsb/L:.6f} ({tsb} blocks)")
            else:
                tsb = int(tsb)
            target_sparsity = tsb / L
        logging.info(f"Pruning rate {target_sparsity*100} "
                     f"(equivalent of {target_sparsity * L} blocks)")

        if args.pruning_method == "window_based":
            attn_mask = mlp_mask = P.window_based(params, cfg, tsb, calibration)
        elif args.pruning_method == "shortgpt":
            attn_mask = mlp_mask = P.shortgpt(params, cfg, tsb, calibration)
        elif args.pruning_method == "blockpruner":
            attn_mask, mlp_mask = P.blockpruner(params, cfg, tsb, first_sample,
                                                seq_len=args.seq_len)
        elif args.pruning_method == "evopress":
            from ssp_x_vit_tpu.llm.evopress import DEFAULT_ARGS, evopress

            # reference protocol: the calibration pool holds
            # calibration_tokens (131072) so the 2048/32768-token selection
            # minibatches draw uncapped (src/evopress.py:152-160); fewer
            # --num-calibration windows than that fires the cap warning in
            # selection() (genuinely small user data).
            n_cal = max(1, DEFAULT_ARGS["calibration_tokens"] // args.seq_len)
            attn_mask, mlp_mask = evopress(
                params, cfg, tsb, calibration[:n_cal],
                num_generations=args.evopress_generations, seed=args.seed)
        elif args.pruning_method == "2ssp":
            out = P.two_stage_2ssp(params, cfg, calibration_2ssp, target_sparsity,
                                   seq_len=args.seq_len)
            if out is False:
                continue
            work_params, work_cfg, info = out
            logging.info(f"2SSP pruned attention blocks: {info['pruned_attention_blocks']}, "
                         f"kept FFN width: {info['num_preserve_mlp']}")
        elif args.pruning_method == "slicegpt":
            from ssp_x_vit_tpu.llm.slicegpt import slicegpt

            work_params, work_cfg = slicegpt(params, cfg, target_sparsity, calibration)
        else:
            logging.error("Invalid method provided")
            sys.exit(1)

        logging.info(f"Pruning Time: {time.time() - start_time} s")

        suffix = (f"sparsity_{target_sparsity:g}" if len(pruning_rates) > 1
                  else None)
        if attn_mask is None:
            run_evals(work_params, work_cfg)
            if args.save_model:
                save_artifact(work_params, work_cfg, suffix)
        else:
            logging.debug(f"Pruned blocks: attn={attn_mask} mlp={mlp_mask}")
            ga = 1.0 - np.asarray(attn_mask, np.float32)
            gm = 1.0 - np.asarray(mlp_mask, np.float32)
            run_evals(params, cfg, attn_gate=ga, mlp_gate=gm)
            if args.save_model:
                try:
                    mp, mc = materialize_masked(params, cfg, attn_mask, mlp_mask)
                except ValueError as e:
                    logging.warning(f"--save-model skipped: {e}")
                else:
                    save_artifact(mp, mc, suffix)


if __name__ == "__main__":
    main()
