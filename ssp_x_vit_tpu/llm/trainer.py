"""Production training loop: schedules, accumulation, clipping, resume.

The reference framework never trains LLMs (``/root/reference/main.py`` has no
optimizer; its only training is the ViT head finetune,
``experiments/vit_pruning/auto_2ssp.py:231-290``). This module completes the
rebuild's beyond-reference training subsystem: a deterministic, resumable
loop over the jitted train steps in :mod:`ssp_x_vit_tpu.llm.train`, with the
standard production pieces —

- **LR schedules**: linear warmup into cosine/linear/constant decay
  (``optax`` schedules; one compiled step for the whole run — the schedule
  rides the optimizer state, so changing LR never retraces).
- **Gradient accumulation**: ``optax.MultiSteps`` accumulates ``accum_steps``
  microbatch gradients IN-GRAPH before each optimizer update — numerically
  identical to a single large batch (mean-of-means over equal microbatches),
  with the same donated-buffer memory profile.
- **Global-norm gradient clipping** ahead of adamw.
- **Checkpoint/resume**: orbax saves every ``checkpoint_every`` optimizer
  updates (:mod:`ssp_x_vit_tpu.utils.checkpointing`); ``fit`` auto-resumes
  from the latest checkpoint in ``checkpoint_dir`` — a killed run continues
  bit-exactly (deterministic data iterators are the caller's contract).
- **Observability**: ``[TRAIN-LOG] {json}`` lines every ``log_every`` steps
  (the machine-readable tagged-line contract the framework's drivers use,
  SURVEY.md §5.5), plus an in-memory history for tests/callers.
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Callable, Iterable, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ssp_x_vit_tpu.llm.model import LlamaConfig, Params
from ssp_x_vit_tpu.llm.train import make_llama_train_step, next_token_loss

__all__ = ["TrainConfig", "make_optimizer", "Trainer"]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Hyperparameters for one finetune/recovery run."""

    learning_rate: float = 1e-4
    total_steps: int = 1000           # optimizer updates (not microbatches)
    warmup_steps: int = 0
    schedule: str = "cosine"          # cosine | linear | constant
    end_lr_ratio: float = 0.1         # decay floor as a fraction of peak
    weight_decay: float = 0.01
    b1: float = 0.9
    b2: float = 0.95
    grad_clip: Optional[float] = 1.0  # global-norm; None disables
    accum_steps: int = 1              # microbatches per optimizer update
    compute_dtype: str = "bfloat16"
    remat: bool = True
    log_every: int = 10
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 100

    def __post_init__(self):
        if self.schedule not in ("cosine", "linear", "constant"):
            raise ValueError(f"unknown schedule {self.schedule!r}")
        if self.accum_steps < 1:
            raise ValueError("accum_steps must be >= 1")
        if self.warmup_steps >= self.total_steps and self.total_steps > 0 \
                and self.schedule != "constant":
            raise ValueError("warmup_steps must be < total_steps")


def make_schedule(tc: TrainConfig) -> optax.Schedule:
    """Warmup + decay schedule over OPTIMIZER updates (accumulation steps
    do not advance it — MultiSteps only ticks the inner state on updates)."""
    peak, end = tc.learning_rate, tc.learning_rate * tc.end_lr_ratio
    decay_steps = max(tc.total_steps - tc.warmup_steps, 1)
    if tc.schedule == "constant":
        decay = optax.constant_schedule(peak)
    elif tc.schedule == "linear":
        decay = optax.linear_schedule(peak, end, decay_steps)
    else:
        decay = optax.cosine_decay_schedule(
            peak, decay_steps, alpha=tc.end_lr_ratio)
    if tc.warmup_steps <= 0:
        return decay
    warmup = optax.linear_schedule(0.0, peak, tc.warmup_steps)
    return optax.join_schedules([warmup, decay], [tc.warmup_steps])


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    """clip -> adamw(schedule), wrapped in MultiSteps when accumulating."""
    parts = []
    if tc.grad_clip is not None:
        parts.append(optax.clip_by_global_norm(tc.grad_clip))
    parts.append(optax.adamw(make_schedule(tc), b1=tc.b1, b2=tc.b2,
                             weight_decay=tc.weight_decay))
    opt = optax.chain(*parts)
    if tc.accum_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=tc.accum_steps)
    return opt


class Trainer:
    """Resumable training loop over a jitted step.

    ``step_factory`` defaults to :func:`make_llama_train_step`; pass
    ``ssp_x_vit_tpu.llm.train.make_distill_train_step`` partials (or any
    factory with the same ``(cfg, optimizer, compute_dtype=, remat=) ->
    step`` signature) for KD recovery runs.
    """

    def __init__(self, cfg: LlamaConfig, tc: TrainConfig, *,
                 step_factory: Optional[Callable] = None):
        self.cfg, self.tc = cfg, tc
        self.optimizer = make_optimizer(tc)
        factory = step_factory or make_llama_train_step
        dtypes = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                  "float16": jnp.float16}
        if tc.compute_dtype not in dtypes:
            raise ValueError(f"unknown compute_dtype {tc.compute_dtype!r}")
        self.step_fn = factory(
            cfg, self.optimizer,
            compute_dtype=dtypes[tc.compute_dtype], remat=tc.remat)
        self.history: List[dict] = []

    # -- microbatch counter <-> optimizer-update counter -------------------
    # The loop counts MICROBATCHES (data consumed); checkpoints and the LR
    # schedule count optimizer UPDATES. update = microbatch // accum_steps.

    def fit(self, params: Params, batches: Iterable[np.ndarray],
            *, eval_tokens: Optional[np.ndarray] = None,
            eval_every: int = 0, eval_seq_len: int = 128,
            verbose: bool = True) -> Tuple[Params, List[dict]]:
        """Run up to ``tc.total_steps`` optimizer updates.

        ``batches`` yields token arrays [b, s+1] (inputs+shifted targets);
        it must be deterministic and restartable from an offset for resume
        to be exact — the trainer skips ``consumed`` microbatches after
        restoring a checkpoint. Returns (params, history).
        """
        tc = self.tc
        opt_state = self.optimizer.init(params)
        start_update = 0
        if tc.checkpoint_dir:
            from ssp_x_vit_tpu.utils.checkpointing import (
                latest_checkpoint, restore_train_state)

            path = latest_checkpoint(tc.checkpoint_dir)
            if path is not None:
                params, opt_state, start_update = restore_train_state(
                    path, params, opt_state)
                if verbose:
                    print(f"[TRAIN-LOG] "
                          f"{json.dumps({'resumed_from': path, 'update': start_update})}")

        it: Iterator[np.ndarray] = iter(batches)
        # replay the data stream to the resume point (deterministic iterator
        # contract); consumed microbatches = updates * accum
        for _ in range(start_update * tc.accum_steps):
            next(it)

        update = start_update
        t0 = time.perf_counter()
        tokens_seen = 0
        losses: List[float] = []
        while update < tc.total_steps:
            try:
                micro = [next(it) for _ in range(tc.accum_steps)]
            except StopIteration:
                break  # data exhausted: stop cleanly at the last full update
            for m in micro:
                tokens = jnp.asarray(np.asarray(m), jnp.int32)
                params, opt_state, loss = self.step_fn(
                    params, opt_state, tokens)
                tokens_seen += int(np.prod(m.shape))
            update += 1
            losses.append(float(loss))  # loss of the update's last microbatch

            if tc.log_every and (
                    update % tc.log_every == 0 or update == tc.total_steps):
                dt = time.perf_counter() - t0
                rec = {"update": update,
                       "loss": round(float(np.mean(losses[-tc.log_every:])), 6),
                       "lr": round(float(make_schedule(tc)(update)), 8),
                       "tokens_seen": tokens_seen,
                       "tok_per_s": round(tokens_seen / max(dt, 1e-9), 1)}
                self.history.append(rec)
                if verbose:
                    print(f"[TRAIN-LOG] {json.dumps(rec)}")

            if eval_tokens is not None and eval_every and \
                    update % eval_every == 0:
                from ssp_x_vit_tpu.llm.evaluation import evaluate_perplexity

                ppl = evaluate_perplexity(params, self.cfg, eval_tokens,
                                          seq_len=eval_seq_len,
                                          enable_tqdm=False)
                rec = {"update": update, "eval_ppl": round(float(ppl), 4)}
                self.history.append(rec)
                if verbose:
                    print(f"[TRAIN-LOG] {json.dumps(rec)}")

            if tc.checkpoint_dir and tc.checkpoint_every and \
                    update % tc.checkpoint_every == 0:
                from ssp_x_vit_tpu.utils.checkpointing import save_train_state

                save_train_state(tc.checkpoint_dir, update, params, opt_state)

        if tc.checkpoint_dir and update > start_update:
            from ssp_x_vit_tpu.utils.checkpointing import save_train_state

            save_train_state(tc.checkpoint_dir, update, params, opt_state)
        return params, self.history
