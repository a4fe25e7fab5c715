"""Training loop: schedules, in-graph gradient accumulation, checkpoint
resume, KD factory wiring (llm/trainer.py, cli/train_llm.py).

The reference never trains LLMs (main.py is prune+eval only); these tests pin
the rebuild's beyond-reference training subsystem: accumulation must equal
the large batch exactly, and a killed+resumed run must equal the
uninterrupted one.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params
from ssp_x_vit_tpu.llm.trainer import (TrainConfig, Trainer, make_optimizer,
                                       make_schedule)

CFG = LlamaConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                  num_kv_heads=2, intermediate_size=64)
S = 16  # seq len (batches carry s+1 tokens)


def _params():
    return init_llama_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


def _batches(n, b, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, CFG.vocab_size, size=(b, S + 1)).astype(np.int32)
            for _ in range(n)]


def test_schedule_warmup_and_decay():
    tc = TrainConfig(learning_rate=1e-3, total_steps=100, warmup_steps=10,
                     schedule="cosine", end_lr_ratio=0.1)
    sched = make_schedule(tc)
    assert float(sched(0)) == pytest.approx(0.0, abs=1e-9)
    assert float(sched(10)) == pytest.approx(1e-3, rel=1e-6)
    assert float(sched(100)) == pytest.approx(1e-4, rel=1e-3)
    # monotone decay after warmup
    assert float(sched(50)) < float(sched(11))

    const = make_schedule(TrainConfig(learning_rate=5e-4,
                                      schedule="constant", total_steps=10))
    assert float(const(0)) == float(const(9)) == pytest.approx(5e-4)


def test_invalid_configs_rejected():
    with pytest.raises(ValueError, match="schedule"):
        TrainConfig(schedule="exotic")
    with pytest.raises(ValueError, match="accum"):
        TrainConfig(accum_steps=0)
    with pytest.raises(ValueError, match="warmup"):
        TrainConfig(total_steps=5, warmup_steps=5)


def test_accumulation_matches_large_batch():
    """accum=2 over two [2, s+1] microbatches == one update on the
    concatenated [4, s+1] batch (mean-of-means + identical adamw state)."""
    micro = _batches(4, 2, seed=1)
    big = [np.concatenate(micro[0:2], axis=0),
           np.concatenate(micro[2:4], axis=0)]

    def run(tc, data):
        tr = Trainer(CFG, tc)
        p, _ = tr.fit(_params(), data, verbose=False)
        return p

    base = dict(learning_rate=1e-3, total_steps=2, schedule="constant",
                grad_clip=None, compute_dtype="float32", log_every=0)
    p_acc = run(TrainConfig(accum_steps=2, **base), micro)
    p_big = run(TrainConfig(accum_steps=1, **base), big)
    # tolerance: fp32 accumulation-order noise through adam's per-element
    # normalization (measured max 8e-6 on 1/4096 elements); a semantic bug
    # (sum instead of mean, wrong schedule tick) shifts most elements by
    # ~lr = 1e-3
    for a, b in zip(jax.tree.leaves(p_acc), jax.tree.leaves(p_big)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-3)


def test_checkpoint_resume_matches_uninterrupted(tmp_path):
    """Run 2 updates, 'crash', re-fit to 4: identical to a fresh 4-update
    run (checkpointed opt_state + deterministic data replay)."""
    data = _batches(4, 2, seed=2)
    base = dict(learning_rate=1e-3, schedule="cosine", warmup_steps=1,
                compute_dtype="float32", log_every=0)

    tr_full = Trainer(CFG, TrainConfig(total_steps=4, **base))
    p_full, _ = tr_full.fit(_params(), data, verbose=False)

    ck = str(tmp_path / "ck")
    tr_a = Trainer(CFG, TrainConfig(total_steps=2, checkpoint_dir=ck,
                                    checkpoint_every=2, **base))
    tr_a.fit(_params(), data, verbose=False)
    tr_b = Trainer(CFG, TrainConfig(total_steps=4, checkpoint_dir=ck,
                                    checkpoint_every=10, **base))
    p_res, _ = tr_b.fit(_params(), data, verbose=False)

    for a, b in zip(jax.tree.leaves(p_full), jax.tree.leaves(p_res)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


def test_loss_decreases_and_history_logs():
    data = _batches(1, 2, seed=3) * 8  # one batch repeated: loss must drop
    tc = TrainConfig(learning_rate=5e-3, total_steps=8, warmup_steps=2,
                     compute_dtype="float32", log_every=4)
    tr = Trainer(CFG, tc)
    _, history = tr.fit(_params(), data, verbose=False)
    losses = [h["loss"] for h in history if "loss" in h]
    assert len(losses) >= 2
    assert losses[-1] < losses[0]
    assert all("lr" in h and "tok_per_s" in h
               for h in history if "loss" in h)


def test_kd_step_factory():
    from ssp_x_vit_tpu.llm.train import make_distill_train_step

    teacher = _params()
    factory = functools.partial(make_distill_train_step, teacher, CFG,
                                alpha=0.5, temperature=2.0)
    tc = TrainConfig(learning_rate=1e-3, total_steps=2,
                     compute_dtype="float32", log_every=0)
    tr = Trainer(CFG, tc, step_factory=factory)
    p, history = tr.fit(_params(), _batches(2, 2, seed=4), verbose=False)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(p))


def test_eval_during_training():
    rng = np.random.default_rng(5)
    eval_tokens = rng.integers(0, CFG.vocab_size, size=(4 * 33,)).astype(np.int32)
    tc = TrainConfig(learning_rate=1e-3, total_steps=2,
                     compute_dtype="float32", log_every=0)
    tr = Trainer(CFG, tc)
    _, history = tr.fit(_params(), _batches(2, 2, seed=5),
                        eval_tokens=eval_tokens, eval_every=1,
                        eval_seq_len=32, verbose=False)
    ppls = [h["eval_ppl"] for h in history if "eval_ppl" in h]
    assert len(ppls) == 2 and all(np.isfinite(p) for p in ppls)


def test_train_cli_smoke(tmp_path, capsys):
    from ssp_x_vit_tpu.cli.train_llm import main

    out = str(tmp_path / "model")
    main(["--model", "tiny-random", "--steps", "2", "--batch-size", "2",
          "--seq-len", "16", "--synthetic-data", "--compute-dtype",
          "float32", "--log-every", "1", "--save-model", out])
    captured = capsys.readouterr().out
    assert "[TRAIN-LOG]" in captured
    import os

    assert os.path.exists(out)
