"""LoRA recovery finetuning (llm/lora.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ssp_x_vit_tpu.llm.lora import (
    apply_lora, init_lora, make_lora_train_step, merge_lora,
)
from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params, llama_forward

CFG = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2, num_heads=4,
                  num_kv_heads=2, intermediate_size=64)


def _tokens(seed=0, b=2, s=24):
    return jax.random.randint(jax.random.PRNGKey(seed), (b, s), 0, CFG.vocab_size)


def test_zero_init_is_identity():
    """b=0 adapters: the adapted model equals the base model exactly."""
    params = init_llama_params(jax.random.PRNGKey(0), CFG)
    lora = init_lora(jax.random.PRNGKey(1), params, rank=4)
    toks = _tokens()
    base, _ = llama_forward(params, toks, CFG, compute_dtype=jnp.float32)
    adapted, _ = llama_forward(apply_lora(params, lora), toks, CFG,
                               compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(adapted))


def test_lora_train_descends_and_freezes_base():
    params = init_llama_params(jax.random.PRNGKey(2), CFG)
    frozen = jax.tree.map(np.asarray, params)
    lora = init_lora(jax.random.PRNGKey(3), params, rank=4)
    opt = optax.adam(1e-2)
    step = make_lora_train_step(CFG, opt, compute_dtype=jnp.float32)
    opt_state = opt.init(lora)
    toks = _tokens(5)
    losses = []
    for _ in range(8):
        lora, opt_state, loss = step(params, lora, opt_state, toks)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.05, losses
    # the base pytree is untouched
    for a, b in zip(jax.tree.leaves(frozen), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # adapters actually moved
    assert float(jnp.max(jnp.abs(lora["q_kernel"]["b"]))) > 0


def test_merge_equals_adapted_and_serves():
    """Merged kernels reproduce the adapted forward exactly and run through
    KV-cached serving as an ordinary pytree."""
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan

    params = init_llama_params(jax.random.PRNGKey(4), CFG)
    lora = init_lora(jax.random.PRNGKey(5), params, rank=4)
    # give the adapters nonzero b so the merge is nontrivial
    lora = jax.tree.map(
        lambda x: x + 0.01 * jax.random.normal(jax.random.PRNGKey(6), x.shape),
        lora)
    toks = _tokens(7)
    adapted, _ = llama_forward(apply_lora(params, lora), toks, CFG,
                               compute_dtype=jnp.float32)
    merged = merge_lora(params, lora)
    merged_out, _ = llama_forward(merged, toks, CFG, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(adapted), np.asarray(merged_out))
    out = generate_kv_scan(merged, CFG, np.asarray([3, 5, 7], np.int32),
                           max_length=12)
    assert np.asarray(out).shape == (12,)


def test_lora_on_moe_base():
    """Attention adapters compose with a MoE base (expert kernels frozen,
    not targetable — they are 4-D)."""
    cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2, num_heads=4,
                      num_kv_heads=2, intermediate_size=64, num_experts=2)
    params = init_llama_params(jax.random.PRNGKey(8), cfg)
    lora = init_lora(jax.random.PRNGKey(9), params, rank=4)
    opt = optax.adam(1e-2)
    step = make_lora_train_step(cfg, opt, compute_dtype=jnp.float32)
    lora, _, loss = step(params, lora, opt.init(lora),
                         jax.random.randint(jax.random.PRNGKey(10), (2, 16),
                                            0, 96))
    assert np.isfinite(float(loss))
    with pytest.raises(ValueError, match="2-D"):
        init_lora(jax.random.PRNGKey(11), params, rank=4,
                  targets=("gate_kernel",))


def test_lora_with_sharded_base():
    """LoRA over a megatron-sharded frozen base: GSPMD derives the tp
    collectives from the base placement while only the (replicated)
    adapters are updated."""
    from ssp_x_vit_tpu.parallel import make_mesh
    from ssp_x_vit_tpu.parallel.llm_sharding import shard_llama_params

    params = init_llama_params(jax.random.PRNGKey(12), CFG)
    mesh = make_mesh(model=4)
    sp = shard_llama_params(params, mesh, CFG)
    lora = init_lora(jax.random.PRNGKey(13), params, rank=4)
    opt = optax.adam(1e-2)
    step = make_lora_train_step(CFG, opt, compute_dtype=jnp.float32)
    st = opt.init(lora)
    toks = _tokens(14, b=4)
    l0 = None
    for _ in range(4):
        lora, st, loss = step(sp, lora, st, toks)
        l0 = l0 or float(loss)
    assert float(loss) < l0


def test_vit_lora_finetune():
    """ViT LoRA: adapters on the fused qkv/proj kernels descend the
    classification loss with the backbone frozen."""
    from ssp_x_vit_tpu.llm.lora import init_lora, merge_lora
    from ssp_x_vit_tpu.models.vit import ViTConfig, init_vit_params, vit_forward
    from ssp_x_vit_tpu.pruning.finetune import (
        VIT_LORA_TARGETS, make_lora_train_step as make_vit_lora_step,
    )

    vcfg = ViTConfig(image_size=32, patch_size=8, hidden_size=64, num_layers=4,
                     num_heads=4, intermediate_size=128, num_classes=10)
    base = init_vit_params(jax.random.PRNGKey(0), vcfg)
    frozen = jax.tree.map(np.asarray, base)
    lora = init_lora(jax.random.PRNGKey(1), base, rank=4,
                     targets=VIT_LORA_TARGETS)
    opt = optax.adam(1e-2)
    step = make_vit_lora_step(vcfg, opt, compute_dtype=jnp.float32)
    st = opt.init(lora)
    px = jax.random.normal(jax.random.PRNGKey(2), (8, 32, 32, 3), jnp.float32)
    labels = jax.random.randint(jax.random.PRNGKey(3), (8,), 0, 10)
    losses = []
    for _ in range(8):
        lora, st, loss = step(base, lora, st, px, labels)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.05, losses
    for a, b in zip(jax.tree.leaves(frozen), jax.tree.leaves(base)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    merged = merge_lora(base, lora)
    logits, _ = vit_forward(merged, px, vcfg, compute_dtype=jnp.float32)
    assert bool(jnp.all(jnp.isfinite(logits)))
