"""Mesh sharding: ViT data-parallel eval, LLM tp+dp numerics on the 8-dev CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from ssp_x_vit_tpu.parallel import make_mesh, replicate, shard_batch
from ssp_x_vit_tpu.parallel.llm_sharding import (
    llama_param_specs, shard_llama_params, evaluate_perplexity_sharded,
)
from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params
from ssp_x_vit_tpu.llm.evaluation import evaluate_perplexity
from ssp_x_vit_tpu.llm.datasets import synthetic_token_stream
from ssp_x_vit_tpu.models.vit import vit_forward
from ssp_x_vit_tpu.evaluation.classify import evaluate_top1


def test_mesh_construction():
    mesh = make_mesh(model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}


def test_vit_data_parallel_matches_single(tiny_cfg, tiny_params, tiny_batches):
    mesh = make_mesh(model=1)
    single = evaluate_top1(tiny_params, tiny_cfg, tiny_batches)
    params_r = replicate(mesh, tiny_params)
    sharded_batches = [shard_batch(mesh, b) for b in tiny_batches]
    dp = evaluate_top1(params_r, tiny_cfg, sharded_batches)
    assert abs(single - dp) < 1e-9


def test_llm_tp_dp_numerics():
    """Sharded (dp=2 x tp=4) perplexity == single-device perplexity."""
    cfg = LlamaConfig(vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
                      num_kv_heads=4, intermediate_size=64)
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    stream = synthetic_token_stream(128 * 6, cfg.vocab_size, seed=0)

    ppl_single = evaluate_perplexity(params, cfg, stream, seq_len=128, enable_tqdm=False)

    mesh = make_mesh(model=4)  # 2 x 4 on the virtual 8-dev CPU mesh
    sharded = shard_llama_params(params, mesh, cfg)
    # verify the intended shardings actually applied
    q_sh = sharded["blocks"]["q_kernel"].sharding
    assert q_sh.spec == P(None, None, "model")
    ppl_sharded = evaluate_perplexity_sharded(sharded, cfg, mesh, stream, seq_len=128)
    assert abs(np.log(ppl_sharded) - np.log(ppl_single)) < 1e-3


def test_llm_tp_dp_odd_window_count():
    """Window count not divisible by dp exercises the padded tail."""
    cfg = LlamaConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                      num_kv_heads=2, intermediate_size=48)
    params = init_llama_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    stream = synthetic_token_stream(128 * 3, cfg.vocab_size, seed=1)  # 3 windows
    ppl_single = evaluate_perplexity(params, cfg, stream, seq_len=128, enable_tqdm=False)
    mesh = make_mesh(model=4)  # dp=2, 3 windows -> one padded slot
    sharded = shard_llama_params(params, mesh, cfg)
    ppl_sharded = evaluate_perplexity_sharded(sharded, cfg, mesh, stream, seq_len=128)
    assert abs(np.log(ppl_sharded) - np.log(ppl_single)) < 1e-3


def test_vit_tp_numerics(tiny_cfg, tiny_params, tiny_batches):
    """ViT tensor-parallel sharding preserves accuracy numerics exactly."""
    from ssp_x_vit_tpu.parallel.vit_sharding import shard_vit_params
    from jax.sharding import PartitionSpec as PS

    single = evaluate_top1(tiny_params, tiny_cfg, tiny_batches[:2])
    mesh = make_mesh(model=4)
    sharded = shard_vit_params(tiny_params, mesh, tiny_cfg)
    assert sharded["blocks"]["qkv_kernel"].sharding.spec == PS(None, None, "model")
    tp = evaluate_top1(sharded, tiny_cfg, [shard_batch(mesh, b) for b in tiny_batches[:2]])
    assert abs(single - tp) < 1e-9
