"""2SSP ablation suite (reference src/ablations.py).

- one_stage_2ssp              — stage-1 (FFN width) only (:88-126)
- two_stage_2ssp_inverted     — rows/cols inverted: prune the MLP's hidden
                                (embedding-side) dims by input/output norms,
                                zero-scatter forward (:129-255). TPU-native:
                                the slice+scatter is an exact elementwise mask
                                on the hidden dims (linear maps with zeroed
                                rows/cols), so candidates need no re-slicing.
- two_stage_2ssp_l1_norm      — stage-1 importance with L1 token norms (:258-343)
- ablation_calibration_dataset — calibration-size x seed sweep (:22-64)
- ablation_balancing_sparsity_ratio — sweep all N_attn (:346-372)
- run_ablations               — the full suite driver (:375-449)
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.llm.model import LlamaConfig, Params, llama_forward
from ssp_x_vit_tpu.llm.evaluation import evaluate_perplexity
from ssp_x_vit_tpu.llm import pruning as P


# ---------------------------------------------------------------------------
# one_stage_2ssp (reference :88-126)
# ---------------------------------------------------------------------------

def one_stage_keep_indices(params: Params, cfg: LlamaConfig, calibration,
                           pruning_rate: float):
    """Stage-1-only selection: (keep_indices per layer, num_preserve) for
    mlp_pruning_rate = rate * main_params / (L * mlp_params) — exposed so the
    reference head-to-head can compare the keep SETS, not just perplexity."""
    L = cfg.num_layers
    main_total, attn_total, mlp_total = P.count_main_params(cfg)
    mlp_pruning_rate = pruning_rate * (main_total / (L * mlp_total))
    num_preserve = int(round(cfg.intermediate_size * (1 - mlp_pruning_rate)))

    importance = P.mlp_hidden_importance(params, cfg, calibration)
    keep = [np.sort(np.argsort(-importance[li], kind="stable")[:num_preserve])
            for li in range(L)]
    return keep, num_preserve


def one_stage_2ssp(params: Params, cfg: LlamaConfig, calibration, pruning_rate: float):
    """Stage-1 only: prune FFN neurons to hit the GLOBAL rate via
    mlp_pruning_rate = rate * main_params / (L * mlp_params)."""
    keep, _ = one_stage_keep_indices(params, cfg, calibration, pruning_rate)
    return P.materialize_llm_width_pruning(params, cfg, keep)


# ---------------------------------------------------------------------------
# inverted rows/cols (reference :129-255)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def _mlp_io_stats(params, tokens, cfg: LlamaConfig):
    _, aux = llama_forward(params, tokens, cfg, collect_mlp_io_stats=True)
    return aux["mlp_in_stats"], aux["mlp_out_stats"]  # [L, b, d] each


def mlp_io_importance(params, cfg, calibration):
    """Mean token-L2 of MLP module inputs/outputs per hidden dim: 2x [L, d]."""
    s_in = s_out = None
    for sample in calibration:
        tokens = jnp.asarray(np.asarray(sample).reshape(1, -1), jnp.int32)
        a, b = _mlp_io_stats(params, tokens, cfg)
        a = np.asarray(jnp.sqrt(a))[:, 0]
        b = np.asarray(jnp.sqrt(b))[:, 0]
        s_in = a if s_in is None else s_in + a
        s_out = b if s_out is None else s_out + b
    n = max(1, len(calibration))
    return s_in / n, s_out / n


def materialize_inverted_mlp_pruning(params, cfg, keep_in: Sequence[np.ndarray],
                                     keep_out: Sequence[np.ndarray]):
    """Zero the pruned hidden dims: gate/up input rows and down output cols.

    Exactly the reference's slice + zero-scatter forward (:149-164): a linear
    map with zeroed input rows equals slicing the input, and zeroed down
    columns equal scattering the output back with zeros. Parameters remain
    physically present; LOGICAL removed params = L*(2f*d_pruned_in +
    f*d_pruned_out) for accounting.
    """
    L = cfg.num_layers
    blocks = dict(params["blocks"])
    gate = np.asarray(blocks["gate_kernel"]).copy()
    up = np.asarray(blocks["up_kernel"]).copy()
    down = np.asarray(blocks["down_kernel"]).copy()
    d = cfg.hidden_size
    for i in range(L):
        in_mask = np.zeros(d, bool)
        in_mask[keep_in[i]] = True
        out_mask = np.zeros(d, bool)
        out_mask[keep_out[i]] = True
        gate[i][~in_mask, :] = 0.0
        up[i][~in_mask, :] = 0.0
        down[i][:, ~out_mask] = 0.0
    blocks["gate_kernel"] = jnp.asarray(gate)
    blocks["up_kernel"] = jnp.asarray(up)
    blocks["down_kernel"] = jnp.asarray(down)
    new_params = dict(params)
    new_params["blocks"] = blocks
    return new_params


def two_stage_2ssp_inverted(params, cfg, calibration, pruning_rate,
                            num_attn_submodules_to_prune: Optional[int] = None,
                            seq_len: int = 2048):
    L = cfg.num_layers
    main_total, attn_total, mlp_total = P.count_main_params(cfg)
    if num_attn_submodules_to_prune is None:
        num_attn_submodules_to_prune = round(
            L * pow(pruning_rate, (mlp_total / attn_total) / 1.5))
    print(f"Pruning {num_attn_submodules_to_prune} attention submodules")
    if (num_attn_submodules_to_prune * attn_total) / main_total > pruning_rate:
        print("Exceeded pruning parameters number")
        return False
    if (num_attn_submodules_to_prune * attn_total + L * mlp_total) / main_total < pruning_rate:
        print(f"Unable to reach the target sparsity rate with only "
              f"{num_attn_submodules_to_prune} pruned attention submodules")
        return False

    mlp_pruning_rate = pruning_rate * (main_total / (L * mlp_total))
    num_preserve_hidden = int(round(cfg.hidden_size * (1 - mlp_pruning_rate)))

    imp_in, imp_out = mlp_io_importance(params, cfg, calibration)
    keep_in = [np.sort(np.argsort(-imp_in[li], kind="stable")[:num_preserve_hidden])
               for li in range(L)]
    keep_out = [np.sort(np.argsort(-imp_out[li], kind="stable")[:num_preserve_hidden])
                for li in range(L)]
    params = materialize_inverted_mlp_pruning(params, cfg, keep_in, keep_out)

    calib_cat = np.concatenate([np.asarray(c).reshape(-1) for c in calibration[:1]])
    attn_mask, _ = P.second_stage_attention(
        params, cfg, num_attn_submodules_to_prune, calib_cat, seq_len=seq_len)
    pruned = [i for i, m in enumerate(attn_mask) if m == 1]
    params, cfg = P.materialize_llm_depth_pruning(params, cfg, pruned)
    info = {"pruned_attention_blocks": pruned, "keep_in": keep_in,
            "keep_out": keep_out, "num_preserve_hidden": num_preserve_hidden}
    return params, cfg, info


# ---------------------------------------------------------------------------
# L1-norm variant (reference :258-343)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def _mlp_stats_l1(params, tokens, cfg: LlamaConfig):
    _, aux = llama_forward(params, tokens, cfg, collect_mlp_stats=True,
                           mlp_stats_kind="sumabs")
    return aux["mlp_stats"]


def two_stage_2ssp_l1_norm(params, cfg, calibration, pruning_rate,
                           num_attn_submodules_to_prune: Optional[int] = None,
                           seq_len: int = 2048):
    L = cfg.num_layers
    main_total, attn_total, mlp_total = P.count_main_params(cfg)
    if num_attn_submodules_to_prune is None:
        num_attn_submodules_to_prune = round(
            L * pow(pruning_rate, (mlp_total / attn_total) / 1.5))
    print(f"Pruning {num_attn_submodules_to_prune} attention submodules")
    if (num_attn_submodules_to_prune * attn_total) / main_total > pruning_rate:
        print("Exceeded pruning parameters number")
        return False
    if (num_attn_submodules_to_prune * attn_total + L * mlp_total) / main_total < pruning_rate:
        print(f"Unable to reach the target sparsity rate with only "
              f"{num_attn_submodules_to_prune} pruned attention submodules")
        return False

    target = int(round(pruning_rate * main_total))
    mlp_params_to_prune = int(round(
        (target - num_attn_submodules_to_prune * attn_total) / L))
    num_preserve = int(round(cfg.intermediate_size * (1 - mlp_params_to_prune / mlp_total)))

    # L1 norm over tokens (p=1), averaged over samples
    sums = None
    for sample in calibration:
        tokens = jnp.asarray(np.asarray(sample).reshape(1, -1), jnp.int32)
        stats = np.asarray(_mlp_stats_l1(params, tokens, cfg))[:, 0]  # [L, f]
        sums = stats if sums is None else sums + stats
    importance = sums / max(1, len(calibration))

    keep = [np.sort(np.argsort(-importance[li], kind="stable")[:num_preserve])
            for li in range(L)]
    params, cfg = P.materialize_llm_width_pruning(params, cfg, keep)

    calib_cat = np.concatenate([np.asarray(c).reshape(-1) for c in calibration[:1]])
    attn_mask, _ = P.second_stage_attention(
        params, cfg, num_attn_submodules_to_prune, calib_cat, seq_len=seq_len)
    pruned = [i for i, m in enumerate(attn_mask) if m == 1]
    params, cfg = P.materialize_llm_depth_pruning(params, cfg, pruned)
    info = {"pruned_attention_blocks": pruned, "keep": keep,
            "num_preserve": num_preserve}
    return params, cfg, info


# ---------------------------------------------------------------------------
# sweep drivers (reference :22-64, :346-372, :375-449)
# ---------------------------------------------------------------------------

def ablation_calibration_dataset(params, cfg, sparsity, calib_stream, eval_ids,
                                 calibration_sizes, seq_len=2048,
                                 method="2ssp", seeds=(0, 1, 2, 3, 4)):
    from ssp_x_vit_tpu.llm.datasets import get_calibration
    from ssp_x_vit_tpu.utils.seeding import set_seed

    print(f"************* Test at sparsity {sparsity} - {method} *************")
    results = []
    for cs in calibration_sizes:
        for seed in seeds:
            set_seed(seed)
            # seeded shuffle of the calibration windows (reference reshuffles
            # the source dataset when seed != 0)
            calib = get_calibration(calib_stream, cs + seed, seq_len=seq_len)[-cs:]
            start = time.time()
            if method == "one_stage_2ssp":
                p2, c2 = one_stage_2ssp(params, cfg, calib, sparsity)
            elif method == "2ssp":
                out = P.two_stage_2ssp(params, cfg, calib, sparsity, seq_len=seq_len)
                if out is False:
                    continue
                p2, c2, _ = out
            else:
                raise ValueError("use only [one_stage_2ssp, 2ssp]")
            elapsed = time.time() - start
            ppl = evaluate_perplexity(p2, c2, eval_ids, seq_len=seq_len, enable_tqdm=False)
            print(f"Pruning Time: {elapsed} s")
            print(f"Calibration size {cs}, Seed {seed}, perplexity {ppl}")
            results.append({"calibration_size": cs, "seed": seed,
                            "ppl": ppl, "time_s": elapsed})
    return results


def ablation_balancing_sparsity_ratio(params, cfg, sparsity, calibration, eval_ids,
                                      seq_len=2048):
    """Sweep every feasible N_attn at a fixed sparsity (reference :346-372)."""
    results = []
    for n_attn in range(0, cfg.num_layers):
        out = P.two_stage_2ssp(params, cfg, calibration, sparsity,
                               num_attn_submodules_to_prune=n_attn, seq_len=seq_len)
        if out is False:
            continue
        p2, c2, _ = out
        ppl = evaluate_perplexity(p2, c2, eval_ids, seq_len=seq_len, enable_tqdm=False)
        print(f"When pruning {n_attn} attention submodules @ {sparsity}, "
              f"perplexity is {ppl}")
        results.append({"n_attn": n_attn, "ppl": ppl})
    return results


def run_ablations(params, cfg, calib_stream, eval_ids, calibration_2ssp,
                  seq_len=2048, quick=False):
    """Full suite (reference :375-449). ``quick`` shrinks the sweeps for
    smoke runs."""
    logging.info('Running ablation: Choice of Calibration Set Size')
    sizes = [2, 4] if quick else [2, 4, 8, 16, 32, 64, 128, 256]
    seeds = (0,) if quick else (0, 1, 2, 3, 4)
    ablation_calibration_dataset(params, cfg, 0.5, calib_stream, eval_ids, sizes,
                                 seq_len=seq_len, method="2ssp", seeds=seeds)

    rates = [0.25] if quick else [0.25, 0.375, 0.5]

    logging.info('Running ablation: Running stage 1 only')
    for rate in rates:
        p2, c2 = one_stage_2ssp(params, cfg, calibration_2ssp, rate)
        ppl = evaluate_perplexity(p2, c2, eval_ids, seq_len=seq_len, enable_tqdm=False)
        logging.info(f"Perplexity @ {rate} : {ppl}")

    logging.info('Running ablation: Pruning Rows-Columns vs. Columns-Rows')
    for rate in rates:
        out = two_stage_2ssp_inverted(params, cfg, calibration_2ssp, rate, seq_len=seq_len)
        if out is False:
            continue
        p2, c2, _ = out
        ppl = evaluate_perplexity(p2, c2, eval_ids, seq_len=seq_len, enable_tqdm=False)
        logging.info(f"Perplexity @ {rate} : {ppl}")

    logging.info('Running ablation: Neuron Selection based on L1 norm')
    for rate in rates:
        out = two_stage_2ssp_l1_norm(params, cfg, calibration_2ssp, rate, seq_len=seq_len)
        if out is False:
            continue
        p2, c2, _ = out
        ppl = evaluate_perplexity(p2, c2, eval_ids, seq_len=seq_len, enable_tqdm=False)
        logging.info(f"Perplexity @ {rate} : {ppl}")

    logging.info('Running ablation: balancing the sparsity rate')
    sweep = range(1, 3) if quick else range(1, cfg.num_layers)
    for i in sweep:
        ablation_balancing_sparsity_ratio(params, cfg, i / cfg.num_layers,
                                          calibration_2ssp, eval_ids, seq_len=seq_len)
