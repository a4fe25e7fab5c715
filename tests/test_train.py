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


def test_distill_recovery_step():
    """KD recovery: a width+depth-pruned student distilled from its dense
    teacher descends the combined loss, and moves its logits TOWARD the
    teacher's (mean KL drops)."""
    from ssp_x_vit_tpu.llm.model import llama_forward_materialized
    from ssp_x_vit_tpu.llm.pruning import (
        materialize_llm_depth_pruning, materialize_llm_width_pruning,
    )
    from ssp_x_vit_tpu.llm.train import make_distill_train_step

    teacher = init_llama_params(jax.random.PRNGKey(20), CFG)
    keeps = [np.arange(32) for _ in range(CFG.num_layers)]
    student, scfg = materialize_llm_width_pruning(
        jax.tree.map(jnp.copy, teacher), CFG, keeps)
    student, scfg = materialize_llm_depth_pruning(student, scfg, [1])
    # Perturb the student away from the teacher so there is a real KL gap
    # for distillation to close (at random tiny-model init both produce
    # near-uniform logits and the KL floor is ~1e-4).
    noise_keys = jax.random.split(jax.random.PRNGKey(99),
                                  len(jax.tree.leaves(student)))
    flat, treedef = jax.tree.flatten(student)
    student = jax.tree.unflatten(treedef, [
        p + 0.08 * jax.random.normal(k, p.shape, p.dtype)
        for p, k in zip(flat, noise_keys)])

    toks = _tokens(CFG, seed=21)

    def _teacher_logits(tk):
        from ssp_x_vit_tpu.llm.model import llama_forward
        logits, _ = llama_forward(teacher, tk[:, :-1], CFG,
                                  compute_dtype=jnp.float32)
        return logits

    def mean_kl(stu):
        t = jax.nn.softmax(_teacher_logits(toks), axis=-1)
        s = jax.nn.log_softmax(
            llama_forward_materialized(stu, toks[:, :-1], scfg,
                                       compute_dtype=jnp.float32), axis=-1)
        return float(jnp.mean(jnp.sum(t * (jnp.log(t + 1e-9) - s), axis=-1)))

    kl0 = mean_kl(student)
    assert kl0 > 0.01, kl0  # the perturbation opened a real gap
    opt = optax.adam(3e-3)
    step = make_distill_train_step(teacher, CFG, scfg, opt, alpha=0.0,
                                   temperature=1.0,
                                   compute_dtype=jnp.float32)
    st = opt.init(student)
    losses = []
    for _ in range(30):
        student, st, loss = step(student, st, toks)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert mean_kl(student) < 0.5 * kl0


def test_vit_distill_recovery_step():
    """ViT KD recovery mirrors the LLM path: a perturbed pruned student
    distilled from the dense teacher closes the teacher-student KL gap."""
    from ssp_x_vit_tpu.models.vit import (
        ViTConfig, init_vit_params, vit_forward, vit_forward_materialized,
    )
    from ssp_x_vit_tpu.pruning import (
        materialize_depth_pruning, materialize_width_pruning,
        select_keep_indices, weight_l1_importance,
    )
    from ssp_x_vit_tpu.pruning.finetune import make_distill_train_step

    vcfg = ViTConfig(image_size=32, patch_size=8, hidden_size=48,
                     num_layers=3, num_heads=4, intermediate_size=96,
                     num_classes=10)
    teacher = init_vit_params(jax.random.PRNGKey(30), vcfg)
    imp = weight_l1_importance(teacher)
    res = select_keep_indices(imp, n_to_prune_per_block=[24] * vcfg.num_layers,
                              min_remaining=8, verbose=False)
    student, scfg = materialize_width_pruning(
        jax.tree.map(jnp.copy, teacher), vcfg, res.keep_indices)
    student, scfg = materialize_depth_pruning(student, scfg, [1])

    flat, treedef = jax.tree.flatten(student)
    noise_keys = jax.random.split(jax.random.PRNGKey(31), len(flat))
    student = jax.tree.unflatten(treedef, [
        p + 0.08 * jax.random.normal(k, p.shape, p.dtype)
        for p, k in zip(flat, noise_keys)])

    px = jax.random.normal(jax.random.PRNGKey(32), (8, 32, 32, 3))
    labels = jax.random.randint(jax.random.PRNGKey(33), (8,), 0, 10)

    def mean_kl(stu):
        t_logits, _ = vit_forward(teacher, px, vcfg, compute_dtype=jnp.float32)
        t = jax.nn.softmax(t_logits, axis=-1)
        s = jax.nn.log_softmax(
            vit_forward_materialized(stu, px, scfg,
                                     compute_dtype=jnp.float32), axis=-1)
        return float(jnp.mean(jnp.sum(t * (jnp.log(t + 1e-9) - s), axis=-1)))

    kl0 = mean_kl(student)
    assert kl0 > 0.01, kl0
    opt = optax.adam(3e-3)
    step = make_distill_train_step(teacher, vcfg, scfg, opt, alpha=0.0,
                                   temperature=1.0,
                                   compute_dtype=jnp.float32)
    st = opt.init(student)
    losses = []
    for _ in range(30):
        student, st, loss = step(student, st, px, labels)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert mean_kl(student) < 0.5 * kl0
