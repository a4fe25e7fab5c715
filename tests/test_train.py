"""Single-chip LLM train step (llm/train.py): optimization progress, remat
gradient equivalence, GQA composition."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params
from ssp_x_vit_tpu.llm.train import make_llama_train_step, next_token_loss

CFG = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2, num_heads=4,
                  num_kv_heads=4, intermediate_size=64)


def _tokens(cfg, b=2, s=24, seed=0):
    return jax.random.randint(jax.random.PRNGKey(seed), (b, s), 0, cfg.vocab_size)


def test_train_step_reduces_loss():
    params = init_llama_params(jax.random.PRNGKey(0), CFG)
    opt = optax.adam(1e-2)
    step = make_llama_train_step(CFG, opt, compute_dtype=jnp.float32)
    opt_state = opt.init(params)
    toks = _tokens(CFG)
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, toks)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.1, losses
    assert np.isfinite(losses).all()


def test_remat_matches_no_remat_grads():
    """jax.checkpoint on the scanned layer must not change gradients."""
    params = init_llama_params(jax.random.PRNGKey(1), CFG)
    toks = _tokens(CFG, seed=3)

    def g(remat):
        return jax.grad(next_token_loss)(params, toks, CFG,
                                         compute_dtype=jnp.float32, remat=remat)

    g_no, g_yes = g(False), g(True)
    flat_no, flat_yes = jax.tree.leaves(g_no), jax.tree.leaves(g_yes)
    assert len(flat_no) == len(flat_yes)
    for a, b in zip(flat_no, flat_yes):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_train_step_gqa():
    cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2, num_heads=4,
                      num_kv_heads=2, intermediate_size=64)
    params = init_llama_params(jax.random.PRNGKey(2), cfg)
    opt = optax.sgd(1e-2)
    step = make_llama_train_step(cfg, opt, compute_dtype=jnp.float32)
    opt_state = opt.init(params)
    params, opt_state, loss = step(params, opt_state, _tokens(cfg, seed=5))
    assert np.isfinite(float(loss))


def test_recovery_finetune_pruned_model():
    """Depth-materialized pruned configs train through the same step — the
    prune -> recovery-finetune loop. Loss must descend and the pruned blocks
    stay physically absent."""
    from ssp_x_vit_tpu.llm.pruning import (
        materialize_llm_depth_pruning, materialize_llm_width_pruning,
    )

    params = init_llama_params(jax.random.PRNGKey(0), CFG)
    keeps = [np.arange(32) for _ in range(CFG.num_layers)]  # keep 32 of 64
    params, cfg = materialize_llm_width_pruning(params, CFG, keeps)
    params, cfg = materialize_llm_depth_pruning(params, cfg, [1])
    assert cfg.pruned_attention_blocks == (1,)

    opt = optax.adam(1e-2)
    step = make_llama_train_step(cfg, opt, compute_dtype=jnp.float32)
    opt_state = opt.init(params)
    toks = _tokens(cfg)
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, toks)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.1, losses
