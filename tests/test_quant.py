"""Weight-only int8 serving (llm/quant.py + serve._mm dispatch).

The reference has no quantized inference; this is rebuild-native serving
infrastructure, so the tests are self-consistency: quantization error bounds,
quantized-vs-dequantized path equivalence, and end-to-end generation across
dense / pruned / phi layouts and the paged engine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params
from ssp_x_vit_tpu.llm.quant import (
    dequantize_weight, quantize_llm_params_int8, quantize_weight_int8,
    quantized_param_bytes,
)
from ssp_x_vit_tpu.llm.serve import generate_kv_scan

CFG = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=3, num_heads=4,
                  num_kv_heads=2, intermediate_size=64)


@pytest.fixture(scope="module")
def llm():
    return init_llama_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32), CFG


def test_quantize_roundtrip_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(1), (5, 48, 64), jnp.float32) * 3.0
    w_q, scale = quantize_weight_int8(w)
    assert w_q.dtype == jnp.int8 and scale.shape == (5, 64)
    err = np.abs(np.asarray(dequantize_weight(w_q, scale)) - np.asarray(w))
    # symmetric round-to-nearest: per-element error <= scale/2 per out-channel
    assert (err <= np.asarray(scale)[:, None, :] * 0.5 + 1e-7).all()
    # scales recover the per-channel absmax at the +/-127 grid ends
    np.testing.assert_allclose(
        np.asarray(scale) * 127.0,
        np.abs(np.asarray(w)).max(axis=-2), rtol=1e-6)


def test_quantized_generation_matches_dequantized(llm):
    """int8-in-graph (scale on the OUTPUT) must equal running the serving
    path on host-dequantized weights: per-output-channel scales commute with
    the contraction, so both compute the same function."""
    params, cfg = llm
    qp = quantize_llm_params_int8(params, cfg)

    deq = {k: v for k, v in qp.items() if k != "blocks"}
    deq["blocks"] = {}
    for k, v in qp["blocks"].items():
        if k.endswith("_q"):
            deq["blocks"][k[:-2]] = dequantize_weight(
                v, qp["blocks"][k[:-2] + "_scale"], jnp.float32)
        elif not k.endswith("_scale"):
            deq["blocks"][k] = v

    prompt = np.asarray([5, 9, 2, 7], np.int32)
    out_q = generate_kv_scan(qp, cfg, prompt, max_length=16,
                             cache_dtype=jnp.float32)
    out_d = generate_kv_scan(deq, cfg, prompt, max_length=16,
                             cache_dtype=jnp.float32)
    np.testing.assert_array_equal(out_q, out_d)


def test_quantized_logits_close_to_dense(llm):
    params, cfg = llm
    qp = quantize_llm_params_int8(params, cfg)
    from ssp_x_vit_tpu.llm.serve import init_cache, prefill

    toks = np.asarray([[3, 1, 4, 1, 5, 9, 2, 6]], np.int32)
    pad0 = jnp.zeros((1,), jnp.int32)
    ck, cv = init_cache(cfg, 1, 8, jnp.float32)
    dense_logits, _, _ = prefill(params, jnp.asarray(toks), ck, cv, cfg, pad0)
    ck, cv = init_cache(cfg, 1, 8, jnp.float32)
    q_logits, _, _ = prefill(qp, jnp.asarray(toks), ck, cv, cfg, pad0)
    d, q = np.asarray(dense_logits[0]), np.asarray(q_logits[0])
    rel = np.linalg.norm(q - d) / np.linalg.norm(d)
    assert rel < 0.15, rel
    corr = np.corrcoef(d, q)[0, 1]
    assert corr > 0.99, corr


def test_quantized_pruned_model_generates(llm):
    """Depth-materialized + width-pruned pytrees quantize and serve through
    the UNROLLED layer path (serve._base_key maps q-suffixed names)."""
    params, cfg = llm
    from ssp_x_vit_tpu.llm import pruning as P

    keep = [np.sort(np.random.default_rng(i).permutation(
        cfg.intermediate_size)[:32]) for i in range(cfg.num_layers)]
    pp, pc = P.materialize_llm_width_pruning(params, cfg, keep)
    pp, pc = P.materialize_llm_depth_pruning(pp, pc, [1])
    qp = quantize_llm_params_int8(pp, pc)

    prompt = np.asarray([1, 2, 3], np.int32)
    ref = generate_kv_scan(pp, pc, prompt, max_length=12, cache_dtype=jnp.float32)
    out = generate_kv_scan(qp, pc, prompt, max_length=12, cache_dtype=jnp.float32)
    assert out.shape == ref.shape
    np.testing.assert_array_equal(out[:3], prompt)


def test_quantized_phi_layout_generates():
    cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2, num_heads=4,
                      num_kv_heads=4, intermediate_size=64, model_type="phi",
                      qkv_bias=True, rotary_dim=4)
    params = init_llama_params(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    qp = quantize_llm_params_int8(params, cfg)
    assert "fc1_kernel_q" in qp["blocks"] and "q_bias" in qp["blocks"]
    out = generate_kv_scan(qp, cfg, np.asarray([4, 8], np.int32),
                           max_length=10, cache_dtype=jnp.float32)
    assert out.shape == (10,)


def test_quantized_paged_engine(llm):
    """The paged continuous-batching path serves int8 pytrees too (its
    matmuls route through serve._mm)."""
    params, cfg = llm
    from ssp_x_vit_tpu.llm.paged import paged_generate

    qp = quantize_llm_params_int8(params, cfg)
    out_q = paged_generate(qp, cfg, [[5, 9, 2], [7, 7]], max_new_tokens=6,
                           page_size=8, cache_dtype=jnp.float32)
    out_c = generate_kv_scan(qp, cfg, [[5, 9, 2], [7, 7]], max_length=9,
                             cache_dtype=jnp.float32)
    # paged vs contiguous on the SAME quantized weights: identical greedy
    np.testing.assert_array_equal(out_q[0], out_c[0])
    np.testing.assert_array_equal(out_q[1][:8], out_c[1][:8])


def test_quantized_bytes_roughly_halved(llm):
    params, cfg = llm
    bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    qp = quantize_llm_params_int8(bf16, cfg)
    # projection kernels dominate asymptotically; on this tiny config just
    # check the quantized tree is strictly smaller and kernels are int8
    assert quantized_param_bytes(qp) < quantized_param_bytes(bf16)
    assert qp["blocks"]["q_kernel_q"].dtype == jnp.int8


def test_quant_matmul_kernel_interpret():
    """Pallas int8/int4 kernels (interpret mode) match the epilogue-scale
    contract exactly — same math serve._mm dispatches to on TPU."""
    from ssp_x_vit_tpu.ops.pallas.quant_matmul import (
        pack_int4, quant4_matmul, quant_matmul, quantize_weight_int4,
        unpack_int4,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 384)), jnp.float32)

    wq, s = quantize_weight_int8(w)
    ref = (x @ wq.astype(jnp.float32)) * s
    np.testing.assert_allclose(np.asarray(quant_matmul(x, wq, s, interpret=True)),
                               np.asarray(ref), rtol=1e-5, atol=1e-4)

    q4 = jnp.asarray(rng.integers(-8, 8, size=(256, 384)), jnp.int8)
    np.testing.assert_array_equal(np.asarray(unpack_int4(pack_int4(q4))),
                                  np.asarray(q4))
    wp, s4 = quantize_weight_int4(w)
    ref4 = (x @ unpack_int4(wp).astype(jnp.float32)) * s4
    # all three unpack variants (int32 shifts / float-domain / split dots)
    # implement the identical contract — the float paths are exact because
    # every intermediate is an integer <= 127 (exact even in bf16)
    for unpack in ("int32", "float", "split"):
        np.testing.assert_allclose(
            np.asarray(quant4_matmul(x, wp, s4, unpack=unpack, interpret=True)),
            np.asarray(ref4), rtol=1e-5, atol=1e-4, err_msg=unpack)


def test_int4_quantization_error_bound():
    from ssp_x_vit_tpu.ops.pallas.quant_matmul import (
        quantize_weight_int4, unpack_int4,
    )

    w = jax.random.normal(jax.random.PRNGKey(2), (64, 128), jnp.float32)
    wp, s = quantize_weight_int4(w)
    deq = np.asarray(unpack_int4(wp), np.float32) * np.asarray(s)[None, :]
    err = np.abs(deq - np.asarray(w))
    assert (err <= np.asarray(s)[None, :] * 0.5 + 1e-7).all()


def test_int4_generation_matches_unpacked(llm):
    """int4 serving pytree (pallas kernel in interpret mode on CPU) equals
    generation on the host-unpacked dequantized weights."""
    from ssp_x_vit_tpu.llm.quant import quantize_llm_params_int4
    from ssp_x_vit_tpu.ops.pallas.quant_matmul import unpack_int4

    params, cfg = llm
    qp4 = quantize_llm_params_int4(params, cfg)

    deq = {k: v for k, v in qp4.items() if k != "blocks"}
    if "lm_head_q" in deq:  # int8 head -> dequantize for the reference run
        deq["lm_head"] = dequantize_weight(
            deq.pop("lm_head_q"), deq.pop("lm_head_scale"), jnp.float32)
    deq["blocks"] = {}
    for k, v in qp4["blocks"].items():
        if k.endswith("_q4"):
            w = jax.vmap(unpack_int4)(v).astype(jnp.float32)
            deq["blocks"][k[:-3]] = w * qp4["blocks"][k[:-3] + "_scale"][:, None, :]
        elif not k.endswith("_scale"):
            deq["blocks"][k] = v

    prompt = np.asarray([5, 9, 2, 7], np.int32)
    out_q = generate_kv_scan(qp4, cfg, prompt, max_length=12,
                             cache_dtype=jnp.float32)
    out_d = generate_kv_scan(deq, cfg, prompt, max_length=12,
                             cache_dtype=jnp.float32)
    np.testing.assert_array_equal(out_q, out_d)


def test_quantized_perplexity_evaluation(llm):
    """The evaluation path (llama_forward -> evaluate_perplexity) measures
    quantized pytrees directly — int8 ppl must sit near dense ppl, so the
    framework can REPORT the accuracy cost of quantization, not just its
    speed."""
    from ssp_x_vit_tpu.llm.datasets import synthetic_token_stream
    from ssp_x_vit_tpu.llm.evaluation import evaluate_perplexity

    params, cfg = llm
    stream = synthetic_token_stream(64 * 3, cfg.vocab_size, seed=0)
    dense = evaluate_perplexity(params, cfg, stream, seq_len=64,
                                enable_tqdm=False)
    q8 = evaluate_perplexity(quantize_llm_params_int8(params, cfg), cfg,
                             stream, seq_len=64, enable_tqdm=False)
    assert abs(np.log(q8) - np.log(dense)) < 0.05, (dense, q8)

    from ssp_x_vit_tpu.llm.quant import quantize_llm_params_int4

    q4 = evaluate_perplexity(quantize_llm_params_int4(params, cfg), cfg,
                             stream, seq_len=64, enable_tqdm=False)
    assert abs(np.log(q4) - np.log(dense)) < 0.5, (dense, q4)


def test_quantized_materialized_full_forward(llm):
    """llama_forward_materialized (depth-pruned unrolled path) accepts
    quantized pytrees — the CLI's --quantize composes with 2SSP output."""
    from ssp_x_vit_tpu.llm import pruning as P
    from ssp_x_vit_tpu.llm.model import llama_forward_materialized

    params, cfg = llm
    keep = [np.sort(np.random.default_rng(i).permutation(
        cfg.intermediate_size)[:32]) for i in range(cfg.num_layers)]
    pp, pc = P.materialize_llm_width_pruning(params, cfg, keep)
    pp, pc = P.materialize_llm_depth_pruning(pp, pc, [1])
    qp = quantize_llm_params_int8(pp, pc)
    toks = jnp.asarray(np.random.default_rng(0).integers(1, 90, (2, 12)))
    ref = llama_forward_materialized(pp, toks, pc, compute_dtype=jnp.float32)
    out = llama_forward_materialized(qp, toks, pc, compute_dtype=jnp.float32)
    d, q = np.asarray(ref), np.asarray(out)
    rel = np.linalg.norm(q - d) / np.linalg.norm(d)
    assert rel < 0.1, rel


def test_llm_quantized_persistence_roundtrip(llm, tmp_path):
    """save_llm_model/load_llm_model round-trip an int8-quantized
    2SSP-materialized model losslessly (int8 codes keep dtype), and the
    reloaded model generates identically."""
    from ssp_x_vit_tpu.llm import pruning as P
    from ssp_x_vit_tpu.llm.checkpoints import load_llm_model, save_llm_model

    params, cfg = llm
    keep = [np.sort(np.random.default_rng(i).permutation(
        cfg.intermediate_size)[:32]) for i in range(cfg.num_layers)]
    pp, pc = P.materialize_llm_width_pruning(params, cfg, keep)
    pp, pc = P.materialize_llm_depth_pruning(pp, pc, [1])
    qp = quantize_llm_params_int8(pp, pc)

    save_llm_model(str(tmp_path / "m"), qp, pc)
    lp, lcfg = load_llm_model(str(tmp_path / "m"), dtype=jnp.float32)
    assert lcfg.pruned_attention_blocks == pc.pruned_attention_blocks
    assert lp["blocks"]["gate_kernel_q"].dtype == jnp.int8

    prompt = np.asarray([5, 9, 2], np.int32)
    a = generate_kv_scan(qp, pc, prompt, max_length=12, cache_dtype=jnp.float32)
    b = generate_kv_scan(lp, lcfg, prompt, max_length=12, cache_dtype=jnp.float32)
    np.testing.assert_array_equal(a, b)


def test_quantize_commutes_with_packing(llm):
    """quantize(pack(params)) and pack(quantize(params)) serve identically
    (QUANT_KEYS covers the fused names; code-review finding, round 2)."""
    from ssp_x_vit_tpu.llm.serve import pack_llm_params_for_serving

    params, cfg = llm
    a = quantize_llm_params_int8(pack_llm_params_for_serving(params, cfg), cfg)
    b = pack_llm_params_for_serving(quantize_llm_params_int8(params, cfg), cfg)
    assert "qkv_kernel_q" in a["blocks"], "packed projections must quantize"
    prompt = np.asarray([4, 8, 15], np.int32)
    out_a = generate_kv_scan(a, cfg, prompt, max_length=14, cache_dtype=jnp.float32)
    out_b = generate_kv_scan(b, cfg, prompt, max_length=14, cache_dtype=jnp.float32)
    np.testing.assert_array_equal(out_a, out_b)
