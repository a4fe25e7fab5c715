"""EvoPress depth-pruning baseline: evolutionary search over (attn, mlp)
binary masks with KL-divergence-to-dense fitness (reference src/evopress.py,
itself adapted from IST-DASLab/EvoPress; config mirrors drop_search.sh).

TPU-native mechanics: candidate evaluation flips gate VALUES on one compiled
forward (no mask/unmask), and dense target logits are computed once. Fitness
is the running token-mean KL(dense || candidate) over a token-budgeted
minibatch, exactly the reference estimator (src/evopress.py:51-96).
"""

from __future__ import annotations

import copy
import functools
import random
import warnings
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.llm.model import LlamaConfig, Params, llama_forward

DEFAULT_ARGS = dict(
    calibration_tokens=131072,
    calibration_sequence_length=8192,
    offspring=32,
    population_size=1,
    initially_generated=64,
    initial_tokens=2048,
    survivors_per_selection=(2, 1),
    tokens_per_selection=(2048, 32768),
    max_mutations=3,
)


def collect_samples_with_join(documents, num_samples: int,
                              sequence_length: int,
                              separator_ids=()) -> List[np.ndarray]:
    """Faithful port of the reference's sample-joining calibration builder
    (src/evopress.py:13-49): documents (already-tokenized id arrays)
    concatenate into a running window; when the window reaches
    ``sequence_length`` it is TRIMMED to exactly that length and emitted
    (the reference notes this trim introduces bias — kept for parity);
    otherwise ``separator_ids`` (the reference's tokenized "\\n\\n") append
    before the next document. Stops after ``num_samples`` windows or when
    documents run out. Returns [1, sequence_length] int32 arrays.

    This is what lets the multi-step selection budgets (2048/32768 tokens,
    src/evopress.py:152-160) run UNCAPPED: build
    ``calibration_tokens // sequence_length`` windows here and
    :func:`selection` never has to shrink its minibatch draw."""
    sep = np.asarray(separator_ids, np.int32).reshape(-1)
    out: List[np.ndarray] = []
    current = np.zeros((0,), np.int32)
    for doc in documents:
        toks = np.asarray(doc, np.int32).reshape(-1)
        current = np.concatenate([current, toks])
        if current.size >= sequence_length:
            out.append(current[:sequence_length].reshape(1, -1).copy())
            current = np.zeros((0,), np.int32)
        else:
            current = np.concatenate([current, sep])
        if len(out) >= num_samples:
            break
    return out


def _gated_logits(params, tokens, attn_gate, mlp_gate, cfg):
    """Gated forward, llama or MLA (the search mechanics are identical —
    both families expose zero-retrace attn/mlp gates)."""
    from ssp_x_vit_tpu.llm.deepseek import DeepseekConfig, deepseek_forward

    if isinstance(cfg, DeepseekConfig):
        return deepseek_forward(params, tokens, cfg, attn_gate=attn_gate,
                                mlp_gate=mlp_gate)
    return llama_forward(params, tokens, cfg, attn_gate=attn_gate,
                         mlp_gate=mlp_gate)[0]


@functools.partial(jax.jit, static_argnames=("cfg",))
def _logits(params, tokens, attn_gate, mlp_gate, cfg):
    return _gated_logits(params, tokens, attn_gate, mlp_gate, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _kl_sum(params, tokens, target_logits, attn_gate, mlp_gate, cfg):
    """Sum over (positions) of KL(target || candidate) and position count,
    excluding the last position (reference :70-71)."""
    logits = _gated_logits(params, tokens, attn_gate, mlp_gate, cfg)
    lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    lt = jax.nn.log_softmax(target_logits[:, :-1].astype(jnp.float32), axis=-1)
    kl = jnp.sum(jnp.exp(lt) * (lt - lp), axis=-1)  # [b, s-1]
    return jnp.sum(kl), kl.size


def compute_kl_div(params, cfg, data, target_logits, attn_mask, mlp_mask) -> float:
    """Token-mean KL over samples (reference compute_kl_div, 'batchmean' over
    positions)."""
    ga = jnp.asarray(1.0 - np.asarray(attn_mask, np.float32))
    gm = jnp.asarray(1.0 - np.asarray(mlp_mask, np.float32))
    total, count = 0.0, 0
    for tokens, target in zip(data, target_logits):
        s, n = _kl_sum(params, jnp.asarray(tokens, jnp.int32), target, ga, gm, cfg)
        total += float(s)
        count += int(n)
    return total / max(1, count)


def selection(
    params, cfg,
    candidates: List[Dict[str, List[int]]],
    num_survive: int,
    calibration_data: List[np.ndarray],
    num_tokens: int,
    target_logits: List,
    rng: random.Random,
    verbose: bool = False,
) -> Tuple[List[Dict[str, List[int]]], List[float]]:
    """Fitness on a freshly drawn minibatch of exactly num_tokens tokens
    (reference :103-143)."""
    requested_tokens = num_tokens
    # Cap the budget at what the calibration set actually holds — otherwise
    # the draw loop can never terminate (the reference assumes 131k tokens).
    # Capping changes selection pressure vs the reference protocol, so warn.
    available = sum(np.asarray(c).size for c in calibration_data)
    if num_tokens > available:
        warnings.warn(
            f"EvoPress selection budget capped: requested {num_tokens} tokens "
            f"but calibration set holds only {available}; selection pressure "
            "differs from the reference protocol (which assumes 131k tokens).",
            stacklevel=2,
        )
        num_tokens = available

    minibatch, minibatch_targets, minibatch_ids = [], [], []
    tokens_used = 0
    while tokens_used < num_tokens:
        mid = rng.randint(0, len(calibration_data) - 1)
        if mid in minibatch_ids:
            continue
        minibatch_ids.append(mid)
        sample = np.asarray(calibration_data[mid]).reshape(1, -1)
        target = target_logits[mid]
        take = min(sample.shape[1], num_tokens - tokens_used)
        minibatch.append(sample[:, :take])
        minibatch_targets.append(target[:, :take])
        tokens_used += take

    if verbose:
        print(f"[evopress] selection: candidates={len(candidates)} survive={num_survive} "
              f"effective_tokens={tokens_used} requested_tokens={requested_tokens}")

    fitnesses = [
        compute_kl_div(params, cfg, minibatch, minibatch_targets, c["attn"], c["mlp"])
        for c in candidates
    ]
    best = np.argsort(fitnesses)[:num_survive]
    return [candidates[i] for i in best], [fitnesses[i] for i in best]


def evopress(
    params: Params,
    cfg: LlamaConfig,
    num_prune: int,
    calibration_data: List[np.ndarray],
    *,
    drop_entire_block: bool = False,
    args: Optional[dict] = None,
    seed: int = 0,
    num_generations: Optional[int] = None,
    verbose: bool = True,
):
    """Returns attn mask (drop_entire_block) or (attn, mlp) masks.

    ``calibration_data`` is a list of [1, seq] token windows (the caller
    handles corpus loading / collect_samples_with_join semantics via
    datasets.get_calibration).
    """
    a = dict(DEFAULT_ARGS)
    if args:
        a.update(args)
    rng = random.Random(seed)
    L = cfg.num_layers
    if num_generations is None:
        num_generations = int(num_prune * (L - num_prune) / 1.5)  # EvoPress Table 8

    # Dense target logits once (reference :187-190)
    dense_gate = jnp.ones((L,), jnp.float32)
    target_logits = [
        np.asarray(_logits(params, jnp.asarray(np.asarray(c).reshape(1, -1), jnp.int32),
                           dense_gate, dense_gate, cfg))
        for c in calibration_data
    ]

    initial: List[Dict[str, List[int]]] = []
    while len(initial) < a["initially_generated"]:
        cand = {"attn": [0] * L, "mlp": [0] * L}
        for ind in rng.sample(range(L), num_prune):
            cand["attn"][ind] = 1
        for ind in rng.sample(range(L), num_prune):
            cand["mlp"][ind] = 1
        if drop_entire_block:
            cand["mlp"] = copy.deepcopy(cand["attn"])
        if cand in initial:
            continue
        initial.append(cand)

    population, train_fitnesses = selection(
        params, cfg, initial, a["population_size"], calibration_data,
        a["initial_tokens"], target_logits, rng, verbose=verbose,
    )

    best_individual = population[0]
    for gen_id in range(num_generations):
        if verbose:
            print(f"Generation {gen_id + 1}/{num_generations}")
            print(f"Train fitness {train_fitnesses[0]:.2e}")

        offspring_list: List[Dict[str, List[int]]] = []
        while len(offspring_list) < a["offspring"]:
            offspring = copy.deepcopy(rng.choice(population))
            num_flips = min(rng.randint(1, a["max_mutations"]),
                            rng.randint(1, a["max_mutations"]))  # bias to low
            for _ in range(num_flips):
                subblock = "attn" if rng.randint(0, 1) == 0 else "mlp"
                remove_ind = rng.randint(0, L - 1)
                while offspring[subblock][remove_ind] == 1:
                    remove_ind = rng.randint(0, L - 1)
                add_ind = rng.randint(0, L - 1)
                while offspring[subblock][add_ind] == 0:
                    add_ind = rng.randint(0, L - 1)
                offspring[subblock][remove_ind] = 1
                offspring[subblock][add_ind] = 0
            if drop_entire_block:
                offspring["mlp"] = copy.deepcopy(offspring["attn"])
            if offspring in offspring_list or offspring in population:
                continue
            offspring_list.append(offspring)

        for num_survive, num_tokens in zip(a["survivors_per_selection"],
                                           a["tokens_per_selection"]):
            if num_survive == a["survivors_per_selection"][-1]:
                for p in population:  # elitism into the final selection step
                    if p not in offspring_list:
                        offspring_list.append(p)
            offspring_list, train_fitnesses = selection(
                params, cfg, offspring_list, num_survive, calibration_data,
                num_tokens, target_logits, rng, verbose=verbose,
            )

        population = offspring_list
        best_individual = population[0]

    if drop_entire_block:
        return best_individual["attn"]
    return best_individual["attn"], best_individual["mlp"]
