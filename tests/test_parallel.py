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


def test_hybrid_mesh_construction():
    """Simulated 2-host DCN x (2 ici_data x 2 model) topology: right shape,
    hosts contiguous along the OUTER stride of the data axis (SURVEY §5.8 /
    VERDICT r2 #8)."""
    from ssp_x_vit_tpu.parallel import make_hybrid_mesh

    mesh = make_hybrid_mesh(2, ici_data=2, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    grid = np.asarray(mesh.devices)
    flat = [d.id for d in grid.reshape(-1)]
    # virtual host 0 = devices 0..3 occupy data rows 0-1; host 1 rows 2-3
    assert flat == list(range(8))

    with pytest.raises(ValueError, match="needs 16"):
        make_hybrid_mesh(4, ici_data=2, model=2)


def test_hybrid_mesh_dp_matches_single(tiny_cfg, tiny_params, tiny_batches):
    """Data-parallel eval over the hybrid-topology mesh == single device."""
    from ssp_x_vit_tpu.parallel import make_hybrid_mesh

    mesh = make_hybrid_mesh(2, ici_data=4, model=1)
    single = evaluate_top1(tiny_params, tiny_cfg, tiny_batches)
    params_r = replicate(mesh, tiny_params)
    sharded = [shard_batch(mesh, b) for b in tiny_batches]
    assert abs(single - evaluate_top1(params_r, tiny_cfg, sharded)) < 1e-9


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


# ---------------- pipeline parallelism (parallel/pipeline.py) ----------------

def _pp_cfg():
    return LlamaConfig(vocab_size=64, hidden_size=32, num_layers=4, num_heads=4,
                       num_kv_heads=2, intermediate_size=64)


def _pp_setup():
    from ssp_x_vit_tpu.parallel.pipeline import (
        make_pipeline_mesh, shard_llama_params_pipeline,
    )
    cfg = _pp_cfg()
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    mesh = make_pipeline_mesh(data=2, pipe=2, model=2)
    sharded = shard_llama_params_pipeline(params, mesh, cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, cfg.vocab_size)
    return cfg, params, mesh, sharded, tokens


def test_pipeline_forward_matches_single():
    """dp=2 x pp=2 x tp=2 pipelined logits == plain llama_forward."""
    from ssp_x_vit_tpu.llm.model import llama_forward
    from ssp_x_vit_tpu.parallel.pipeline import make_pipeline_forward

    cfg, params, mesh, sharded, tokens = _pp_setup()
    ref, _ = llama_forward(params, tokens, cfg, compute_dtype=jnp.float32)
    fwd = make_pipeline_forward(mesh, cfg, num_microbatches=2)
    out = jax.jit(fwd)(sharded, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_pipeline_forward_matches_single_phi():
    """phi-2 parallel-residual block (partial rotary, LayerNorm, biases)
    through the dp=2 x pp=2 x tp=2 pipeline (VERDICT r2 #7)."""
    from ssp_x_vit_tpu.llm.model import llama_forward
    from ssp_x_vit_tpu.parallel.pipeline import (
        make_pipeline_forward, make_pipeline_mesh, shard_llama_params_pipeline,
    )

    cfg = LlamaConfig(vocab_size=64, hidden_size=32, num_layers=4, num_heads=4,
                      num_kv_heads=4, intermediate_size=64, model_type="phi",
                      qkv_bias=True, rotary_dim=4)
    params = init_llama_params(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    mesh = make_pipeline_mesh(data=2, pipe=2, model=2)
    sharded = shard_llama_params_pipeline(params, mesh, cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(4), (4, 16), 0, cfg.vocab_size)
    ref, _ = llama_forward(params, tokens, cfg, compute_dtype=jnp.float32)
    fwd = make_pipeline_forward(mesh, cfg, num_microbatches=2)
    out = jax.jit(fwd)(sharded, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_pipeline_forward_matches_single_gemma2():
    """gemma-2 through the dp=2 x pp=2 x tp=2 pipeline: scaled embeddings,
    tanh-gelu GLU, 4-norm blocks, both softcaps, and MIXED per-layer
    sliding windows as pipe-sharded traced band bounds (window 6 binds at
    s=16). Stages hold {windowed, full} layer pairs each."""
    from ssp_x_vit_tpu.llm.model import llama_forward
    from ssp_x_vit_tpu.parallel.pipeline import (
        make_pipeline_forward, make_pipeline_mesh, shard_llama_params_pipeline,
    )

    cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=4, num_heads=4,
                      num_kv_heads=2, intermediate_size=64, model_type="gemma2",
                      explicit_head_dim=16, hidden_act="gelu_tanh",
                      scale_embeddings=True, tie_embeddings=True,
                      sliding_window=6, window_layers=(0, 2),
                      attn_softcap=50.0, final_softcap=30.0)
    params = init_llama_params(jax.random.PRNGKey(11), cfg, dtype=jnp.float32)
    mesh = make_pipeline_mesh(data=2, pipe=2, model=2)
    sharded = shard_llama_params_pipeline(params, mesh, cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(12), (4, 16), 0, cfg.vocab_size)
    ref, _ = llama_forward(params, tokens, cfg, compute_dtype=jnp.float32)
    fwd = make_pipeline_forward(mesh, cfg, num_microbatches=2)
    out = jax.jit(fwd)(sharded, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_pipeline_grads_match_single():
    """Gradients through the ppermute schedule == single-device gradients
    (incl. the replicated-embed transpose-psum)."""
    from ssp_x_vit_tpu.llm.model import llama_forward
    from ssp_x_vit_tpu.parallel.pipeline import make_pipeline_forward

    cfg, params, mesh, sharded, tokens = _pp_setup()

    def nll(logits, tokens):
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        return -jnp.take_along_axis(logp, tokens[:, 1:, None], axis=-1)[..., 0].mean()

    def ref_loss(p):
        logits, _ = llama_forward(p, tokens, cfg, compute_dtype=jnp.float32)
        return nll(logits, tokens)

    fwd = make_pipeline_forward(mesh, cfg, num_microbatches=2)

    def pipe_loss(p):
        return nll(fwd(p, tokens), tokens)

    l_ref, g_ref = jax.value_and_grad(ref_loss)(params)
    l_p, g_p = jax.jit(jax.value_and_grad(pipe_loss))(sharded)
    assert abs(float(l_ref) - float(l_p)) < 1e-5
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_p = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(g_p)}
    for k, v in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_p[jax.tree_util.keystr(k)]), np.asarray(v),
            atol=5e-5, rtol=5e-4, err_msg=jax.tree_util.keystr(k))


def test_pipeline_train_step_runs():
    import optax
    from ssp_x_vit_tpu.parallel.pipeline import make_pipeline_train_step

    cfg, params, mesh, sharded, tokens = _pp_setup()
    opt = optax.adamw(1e-3)
    step = make_pipeline_train_step(mesh, cfg, opt, num_microbatches=2)
    state = opt.init(sharded)
    p1, state, loss1 = step(sharded, state, tokens)
    p2, state, loss2 = step(p1, state, tokens)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert float(loss2) < float(loss1)  # adamw on the same batch must descend


def test_pipeline_1f1b_train_matches_single_device():
    """1F1B schedule (manual per-stage vjp + reverse ppermute): one adamw
    step from identical inits matches the single-device llm/train.py step —
    the per-stage vjps compose to the same chain GPipe's autodiff builds,
    with O(P) instead of O(M) saved microbatch activations."""
    import optax

    from ssp_x_vit_tpu.llm.train import make_llama_train_step
    from ssp_x_vit_tpu.parallel.pipeline import (
        make_pipeline_train_step, shard_llama_params_pipeline,
    )

    cfg, params, mesh, _, _ = _pp_setup()
    sharded = shard_llama_params_pipeline(params, mesh, cfg)
    # global batch 8 = M(4) x data(2) x mb(1); M > P exercises the
    # steady-state 1F/1B interleave, not just fill/drain
    tokens = jax.random.randint(jax.random.PRNGKey(3), (8, 16), 0,
                                cfg.vocab_size)
    # sgd: param delta == -lr * grad, so this compares GRADIENTS directly —
    # adamw's first step is scale-invariant (m/sqrt(v) ~= sign(g)) and would
    # mask factor-of-tp/M accumulation errors
    opt = optax.sgd(1e-1)
    single = make_llama_train_step(cfg, opt, compute_dtype=jnp.float32)
    p1, _, loss1 = single(jax.tree.map(jnp.copy, params), opt.init(params),
                          np.asarray(tokens, np.int32))

    step = make_pipeline_train_step(mesh, cfg, opt, num_microbatches=4,
                                    schedule="1f1b")
    p2, _, loss2 = step(sharded, opt.init(sharded), tokens)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    flat1 = {jax.tree_util.keystr(k): v for k, v in
             jax.tree_util.tree_leaves_with_path(p1)}
    for k, v in jax.tree_util.tree_leaves_with_path(p2):
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat1[jax.tree_util.keystr(k)]),
            rtol=1e-4, atol=1e-5, err_msg=jax.tree_util.keystr(k))


def test_pipeline_1f1b_train_gemma2_tied():
    """1F1B on gemma-2: tied scaled embeddings (lookup scatter + head grads
    both fold into d_embed), mixed per-layer windows riding the pipe-sharded
    band bounds, softcaps through the in-schedule head vjp."""
    import optax

    from ssp_x_vit_tpu.llm.train import make_llama_train_step
    from ssp_x_vit_tpu.parallel.pipeline import (
        make_pipeline_mesh, make_pipeline_train_step,
        shard_llama_params_pipeline,
    )

    cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=4, num_heads=4,
                      num_kv_heads=2, intermediate_size=64, model_type="gemma2",
                      explicit_head_dim=8, hidden_act="gelu_tanh",
                      scale_embeddings=True, tie_embeddings=True,
                      sliding_window=6, window_layers=(0, 2),
                      attn_softcap=50.0, final_softcap=30.0)
    params = init_llama_params(jax.random.PRNGKey(7), cfg, dtype=jnp.float32)
    tokens = jax.random.randint(jax.random.PRNGKey(8), (4, 16), 0, cfg.vocab_size)

    opt = optax.sgd(1e-1)  # param delta == -lr * grad (see test above)
    single = make_llama_train_step(cfg, opt, compute_dtype=jnp.float32)
    p1, _, loss1 = single(jax.tree.map(jnp.copy, params), opt.init(params),
                          np.asarray(tokens, np.int32))

    mesh = make_pipeline_mesh(data=2, pipe=2, model=2)
    sharded = shard_llama_params_pipeline(params, mesh, cfg)
    step = make_pipeline_train_step(mesh, cfg, opt, num_microbatches=2,
                                    schedule="1f1b")
    p2, _, loss2 = step(sharded, opt.init(sharded), tokens)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    flat1 = {jax.tree_util.keystr(k): v for k, v in
             jax.tree_util.tree_leaves_with_path(p1)}
    for k, v in jax.tree_util.tree_leaves_with_path(p2):
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat1[jax.tree_util.keystr(k)]),
            rtol=1e-4, atol=1e-5, err_msg=jax.tree_util.keystr(k))


# ---------------- ring attention / sequence parallelism ----------------

def test_ring_attention_matches_sdpa():
    from jax.sharding import Mesh
    from ssp_x_vit_tpu.ops.attention import sdpa_reference
    from ssp_x_vit_tpu.parallel.ring_attention import ring_attention

    b, h, s, hd, sp = 2, 4, 32, 8, 4
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, s, hd), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, s, hd), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, s, hd), jnp.float32)
    ref = sdpa_reference(q, k, v, causal=True)

    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "seq"))
    ring = jax.shard_map(
        lambda q, k, v: ring_attention(q, k, v, "seq", n_chunks=sp, causal=True),
        mesh=mesh, in_specs=(P(None, None, "seq", None),) * 3,
        out_specs=P(None, None, "seq", None), check_vma=False)
    out = jax.jit(ring)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-4)


def test_seq_parallel_perplexity_matches_single():
    from jax.sharding import Mesh
    from ssp_x_vit_tpu.parallel.ring_attention import evaluate_perplexity_seq_parallel

    cfg = LlamaConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                      num_kv_heads=2, intermediate_size=48)
    params = init_llama_params(jax.random.PRNGKey(2), cfg, dtype=jnp.float32)
    stream = synthetic_token_stream(64 * 3, cfg.vocab_size, seed=3)  # 3 windows
    ppl_single = evaluate_perplexity(params, cfg, stream, seq_len=64, enable_tqdm=False)

    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "seq"))
    ppl_sp = evaluate_perplexity_seq_parallel(params, cfg, mesh, stream, seq_len=64)
    assert abs(np.log(ppl_sp) - np.log(ppl_single)) < 1e-3


def test_seq_parallel_perplexity_matches_single_phi():
    """Ring-attention sequence parallelism on the phi-2 block: partial rotary
    at GLOBAL positions, shared LayerNorm, biased projections, lm_head bias
    (VERDICT r2 #7)."""
    from jax.sharding import Mesh
    from ssp_x_vit_tpu.parallel.ring_attention import evaluate_perplexity_seq_parallel

    cfg = LlamaConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                      num_kv_heads=4, intermediate_size=48, model_type="phi",
                      qkv_bias=True, rotary_dim=4)
    params = init_llama_params(jax.random.PRNGKey(5), cfg, dtype=jnp.float32)
    stream = synthetic_token_stream(64 * 3, cfg.vocab_size, seed=6)
    ppl_single = evaluate_perplexity(params, cfg, stream, seq_len=64, enable_tqdm=False)

    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "seq"))
    ppl_sp = evaluate_perplexity_seq_parallel(params, cfg, mesh, stream, seq_len=64)
    assert abs(np.log(ppl_sp) - np.log(ppl_single)) < 1e-3


def test_seq_parallel_perplexity_matches_single_gemma2():
    """Ring-attention sequence parallelism on the gemma-2 block: mixed
    per-layer sliding windows (traced band bounds over GLOBAL ring
    positions), attn softcap in the ring's online softmax, final softcap,
    4-norm blocks, sqrt(d)-scaled embeddings, tied head. Window 6 < s_local
    16 makes the band bind across chunk boundaries."""
    from jax.sharding import Mesh
    from ssp_x_vit_tpu.parallel.ring_attention import evaluate_perplexity_seq_parallel

    cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=4, num_heads=4,
                      num_kv_heads=2, intermediate_size=64, model_type="gemma2",
                      explicit_head_dim=16, hidden_act="gelu_tanh",
                      scale_embeddings=True, tie_embeddings=True,
                      sliding_window=6, window_layers=(0, 2),
                      attn_softcap=50.0, final_softcap=30.0)
    params = init_llama_params(jax.random.PRNGKey(7), cfg, dtype=jnp.float32)
    stream = synthetic_token_stream(64 * 3, cfg.vocab_size, seed=8)
    ppl_single = evaluate_perplexity(params, cfg, stream, seq_len=64, enable_tqdm=False)

    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "seq"))
    ppl_sp = evaluate_perplexity_seq_parallel(params, cfg, mesh, stream, seq_len=64)
    assert abs(np.log(ppl_sp) - np.log(ppl_single)) < 1e-3


def test_seq_parallel_perplexity_matches_single_uniform_window():
    """Uniform sliding window (mistral) on the ring: the static band masks
    at global positions — exact vs single-device (the ring buys little for
    uniform SWA, but must not be WRONG when used)."""
    from jax.sharding import Mesh
    from ssp_x_vit_tpu.parallel.ring_attention import evaluate_perplexity_seq_parallel

    cfg = LlamaConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                      num_kv_heads=2, intermediate_size=48, sliding_window=10)
    params = init_llama_params(jax.random.PRNGKey(9), cfg, dtype=jnp.float32)
    stream = synthetic_token_stream(64 * 3, cfg.vocab_size, seed=10)
    ppl_single = evaluate_perplexity(params, cfg, stream, seq_len=64, enable_tqdm=False)

    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "seq"))
    ppl_sp = evaluate_perplexity_seq_parallel(params, cfg, mesh, stream, seq_len=64)
    assert abs(np.log(ppl_sp) - np.log(ppl_single)) < 1e-3


# ---------------- tensor-parallel serving (round 2) ----------------

def test_tp_serving_matches_single_device():
    """Head-sharded KV cache + megatron params: tp=4 greedy generation equals
    the single-device serve path token-for-token (f32)."""
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan
    from ssp_x_vit_tpu.parallel.llm_sharding import tp_generate_kv_scan

    cfg = LlamaConfig(vocab_size=128, hidden_size=32, num_layers=2,
                      num_heads=4, num_kv_heads=4, intermediate_size=64)
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    prompt = np.asarray([3, 5, 7, 11], np.int32)
    single = generate_kv_scan(params, cfg, prompt, max_length=16,
                              cache_dtype=jnp.float32)
    mesh = make_mesh(model=4)
    tp = tp_generate_kv_scan(params, cfg, mesh, prompt, max_length=16,
                             cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(single), np.asarray(tp))


def test_tp_serving_gqa_and_batched():
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan
    from ssp_x_vit_tpu.parallel.llm_sharding import tp_generate_kv_scan

    cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2,
                      num_heads=4, num_kv_heads=2, intermediate_size=48)
    params = init_llama_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    mesh = make_mesh(model=2)  # nkv=2 over model=2; data axis unused
    single = generate_kv_scan(params, cfg, [[1, 2, 3], [9, 8]],
                              max_length=12, cache_dtype=jnp.float32)
    tp = tp_generate_kv_scan(params, cfg, mesh, [[1, 2, 3], [9, 8]],
                             max_length=12, cache_dtype=jnp.float32)
    for s, t in zip(single, tp):
        np.testing.assert_array_equal(np.asarray(s), np.asarray(t))


def test_tp_serving_full_int8():
    """TP serving with int8 WEIGHTS and int8 KV cache: quantized spec rules
    (<k>_q/<k>_scale) shard correctly and the dict cache shards over heads."""
    from ssp_x_vit_tpu.llm.quant import quantize_llm_params_int8
    from ssp_x_vit_tpu.parallel.llm_sharding import (
        llm_param_specs_like, tp_generate_kv_scan,
    )
    from jax.sharding import PartitionSpec as PS

    cfg = LlamaConfig(vocab_size=128, hidden_size=32, num_layers=2,
                      num_heads=4, num_kv_heads=4, intermediate_size=64)
    params = init_llama_params(jax.random.PRNGKey(2), cfg, dtype=jnp.float32)
    qp = quantize_llm_params_int8(params, cfg)
    specs = llm_param_specs_like(qp)
    assert specs["blocks"]["q_kernel_q"] == PS(None, None, "model")
    assert specs["blocks"]["q_kernel_scale"] == PS(None, "model")
    assert specs["blocks"]["down_kernel_scale"] == PS(None, None)

    mesh = make_mesh(model=4)
    prompt = np.asarray([4, 8, 15, 16], np.int32)
    out = tp_generate_kv_scan(qp, cfg, mesh, prompt, max_length=14,
                              cache_dtype=jnp.int8)
    assert out.shape == (14,)
    np.testing.assert_array_equal(np.asarray(out)[:4], prompt)


def test_tp_serving_packed_params_shard():
    """Packed (fused qkv/gateup) pytrees still TENSOR-parallel shard: the
    fused kernels are column-parallel, not silently replicated (round-2
    review finding)."""
    from jax.sharding import PartitionSpec as PS

    from ssp_x_vit_tpu.llm.quant import quantize_llm_params_int8
    from ssp_x_vit_tpu.llm.serve import generate_kv_scan, pack_llm_params_for_serving
    from ssp_x_vit_tpu.parallel.llm_sharding import (
        llm_param_specs_like, tp_generate_kv_scan,
    )

    cfg = LlamaConfig(vocab_size=128, hidden_size=32, num_layers=2,
                      num_heads=4, num_kv_heads=4, intermediate_size=64)
    params = init_llama_params(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    packed = pack_llm_params_for_serving(
        quantize_llm_params_int8(params, cfg), cfg)
    specs = llm_param_specs_like(packed)
    assert specs["blocks"]["qkv_kernel_q"] == PS(None, None, "model")
    assert specs["blocks"]["gateup_kernel_scale"] == PS(None, "model")

    mesh = make_mesh(model=4)
    prompt = np.asarray([2, 3, 5, 7], np.int32)
    single = generate_kv_scan(packed, cfg, prompt, max_length=12,
                              cache_dtype=jnp.float32)
    tp = tp_generate_kv_scan(packed, cfg, mesh, prompt, max_length=12,
                             cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(single), np.asarray(tp))


def test_sharded_train_step_matches_single_device():
    """dp x tp train step (GSPMD megatron shardings): after one adamw step
    from identical inits, loss and updated params match the single-device
    llm/train.py step."""
    import optax

    from ssp_x_vit_tpu.llm.train import make_llama_train_step
    from ssp_x_vit_tpu.parallel.llm_sharding import make_sharded_llama_train_step

    cfg = LlamaConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                      num_kv_heads=2, intermediate_size=64)
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    toks = np.asarray(
        jax.random.randint(jax.random.PRNGKey(1), (4, 24), 0, 64), np.int32)

    opt = optax.adamw(1e-2)
    single = make_llama_train_step(cfg, opt, compute_dtype=jnp.float32)
    p1, s1, loss1 = single(jax.tree.map(jnp.copy, params), opt.init(params), toks)

    mesh = make_mesh(model=4)  # dp=2 x tp=4
    sp = shard_llama_params(params, mesh, cfg)
    sharded = make_sharded_llama_train_step(mesh, cfg, opt,
                                            compute_dtype=jnp.float32)
    p2, s2, loss2 = sharded(sp, opt.init(sp), toks)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_fsdp_train_step_matches_single_device():
    """FSDP (ZeRO-3-style): params + grads + adamw moments sharded over
    'data'; one step matches the single-device step, and the updated params
    KEEP their fsdp shardings (guaranteed by in-step constraints)."""
    import optax

    from ssp_x_vit_tpu.llm.train import make_llama_train_step
    from ssp_x_vit_tpu.parallel.llm_sharding import (
        fsdp_llama_param_specs_like, make_fsdp_llama_train_step,
        shard_llama_params_fsdp,
    )

    cfg = LlamaConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                      num_kv_heads=2, intermediate_size=64)
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    toks = np.asarray(
        jax.random.randint(jax.random.PRNGKey(1), (8, 24), 0, 64), np.int32)

    opt = optax.adamw(1e-2)
    single = make_llama_train_step(cfg, opt, compute_dtype=jnp.float32)
    p1, s1, loss1 = single(jax.tree.map(jnp.copy, params), opt.init(params), toks)

    mesh = make_mesh(model=1)  # pure fsdp over data=8
    sp = shard_llama_params_fsdp(params, mesh)
    # block kernels [L, d, d'] must actually be sharded, not replicated
    qspec = sp["blocks"]["q_kernel"].sharding.spec
    assert "data" in jax.tree.leaves(tuple(qspec)), qspec
    opt_state = opt.init(sp)
    fsdp = make_fsdp_llama_train_step(mesh, cfg, opt, compute_dtype=jnp.float32)
    p2, s2, loss2 = fsdp(sp, opt_state, toks)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
    # placement survives the step: updated q_kernel still sharded over data
    specs = fsdp_llama_param_specs_like(p2, mesh.shape["data"])
    got = p2["blocks"]["q_kernel"].sharding.spec
    assert got == specs["blocks"]["q_kernel"], got
    # adamw moments inherit the fsdp placement (the ZeRO memory win)
    mu_leaf = s2[0].mu["blocks"]["q_kernel"]
    assert "data" in jax.tree.leaves(tuple(mu_leaf.sharding.spec)), \
        mu_leaf.sharding.spec


def test_tp_deepseek_mla_matches_single_device():
    """DeepSeek MLA tensor parallelism from placements alone (megatron for
    MLA): head-major column-parallel q/q_b/kv_b, row-parallel o,
    expert-axis MoE sharding, vocab-sharded lm_head — the compressed
    latent cache derives from the replicated kv_a projection so it
    replicates. Greedy absorbed-decode generation over the tp=4 mesh
    equals single device token-for-token (f32)."""
    from ssp_x_vit_tpu.llm.deepseek import (
        DeepseekConfig, deepseek_generate, init_deepseek_params,
    )
    from ssp_x_vit_tpu.parallel.llm_sharding import shard_deepseek_params

    cfg = DeepseekConfig(vocab_size=64, hidden_size=16, num_layers=3,
                         num_heads=4, kv_lora_rank=8, qk_nope_head_dim=4,
                         qk_rope_head_dim=4, v_head_dim=4,
                         intermediate_size=24, n_routed_experts=4,
                         n_shared_experts=1, num_experts_per_tok=2,
                         moe_intermediate_size=12, q_lora_rank=8,
                         first_k_dense_replace=1, routed_scaling_factor=1.5)
    params = init_deepseek_params(jax.random.PRNGKey(0), cfg)
    prompt = np.asarray([3, 11, 7, 30], np.int32)
    ref = deepseek_generate(params, cfg, prompt, max_new_tokens=6,
                            compute_dtype=jnp.float32)
    mesh = make_mesh(model=4)
    sharded = shard_deepseek_params(params, mesh, cfg)
    tp = deepseek_generate(sharded, cfg, prompt, max_new_tokens=6,
                           compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(tp), np.asarray(ref))


def test_tp_deepseek_divisibility_refusals():
    from ssp_x_vit_tpu.llm.deepseek import DeepseekConfig, init_deepseek_params
    from ssp_x_vit_tpu.parallel.llm_sharding import shard_deepseek_params

    mesh = make_mesh(model=4)
    cfg = DeepseekConfig(vocab_size=64, hidden_size=16, num_layers=2,
                         num_heads=2, kv_lora_rank=8, qk_nope_head_dim=4,
                         qk_rope_head_dim=4, v_head_dim=4,
                         intermediate_size=24, n_routed_experts=0)
    params = init_deepseek_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="num_heads"):
        shard_deepseek_params(params, mesh, cfg)
