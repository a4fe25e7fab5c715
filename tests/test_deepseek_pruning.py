"""Pruning surgery on the DeepSeek/MLA family (llm/pruning_deepseek.py).

The reference's pruning methods (2SSP src/pruning.py:228-294, window_based
:29-64, shortGPT :82-107, blockpruner :127-194, EvoPress src/evopress.py)
are architecture-generic over gated attention/MLP submodules; these tests
pin the MLA instantiation: gate == materialized exactness, stage-1 stats,
end-to-end 2SSP, depth baselines, persistence and export behavior.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssp_x_vit_tpu.llm.deepseek import (
    DeepseekConfig, deepseek_forward, deepseek_forward_materialized,
    deepseek_generate, init_deepseek_params, load_deepseek_model,
    save_deepseek_model,
)
from ssp_x_vit_tpu.llm import pruning as P
from ssp_x_vit_tpu.llm.evaluation import (evaluate_perplexity,
                                          evaluate_perplexity_candidates)
from ssp_x_vit_tpu.llm.pruning_deepseek import (
    count_main_params_deepseek, materialize_deepseek_attention_pruning,
    materialize_deepseek_block_removal, materialize_deepseek_width_pruning,
)

F32 = jnp.float32


def dense_cfg(**over):
    kw = dict(vocab_size=97, hidden_size=32, num_layers=4, num_heads=2,
              kv_lora_rank=16, qk_nope_head_dim=8, qk_rope_head_dim=4,
              v_head_dim=8, intermediate_size=48, n_routed_experts=0)
    kw.update(over)
    return DeepseekConfig(**kw)


def moe_cfg(**over):
    kw = dict(vocab_size=97, hidden_size=32, num_layers=4, num_heads=2,
              kv_lora_rank=16, qk_nope_head_dim=8, qk_rope_head_dim=4,
              v_head_dim=8, intermediate_size=48, moe_intermediate_size=16,
              n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
              first_k_dense_replace=2, q_lora_rank=12)
    kw.update(over)
    return DeepseekConfig(**kw)


def make(cfg, seed=0):
    return init_deepseek_params(jax.random.PRNGKey(seed), cfg)


def toks(n=12, b=2, seed=0, v=97):
    return np.random.RandomState(seed).randint(0, v, (b, n)).astype(np.int32)


def test_all_ones_gates_are_identity():
    cfg = moe_cfg()
    p = make(cfg)
    ids = toks()
    base = deepseek_forward(p, ids, cfg, compute_dtype=F32)
    gated = deepseek_forward(p, ids, cfg, compute_dtype=F32,
                             attn_gate=jnp.ones(4), mlp_gate=jnp.ones(4))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(gated))


@pytest.mark.parametrize("cfg_fn,pruned", [(dense_cfg, [2]),
                                           (moe_cfg, [1, 3])])
def test_attention_gate_matches_materialized(cfg_fn, pruned):
    """gate=0 on a layer's attention == physically removing its MLA weights
    and running the unrolled materialized forward."""
    cfg = cfg_fn()
    p = make(cfg)
    ids = toks()
    ga = np.ones(4, np.float32)
    for i in pruned:
        ga[i] = 0.0
    gated = deepseek_forward(p, ids, cfg, compute_dtype=F32,
                             attn_gate=jnp.asarray(ga))
    pm, cm = materialize_deepseek_attention_pruning(p, cfg, pruned)
    assert cm.pruned_attention_blocks == tuple(pruned)
    mat = deepseek_forward_materialized(pm, ids, cm, compute_dtype=F32)
    np.testing.assert_allclose(np.asarray(gated), np.asarray(mat),
                               rtol=1e-5, atol=1e-5)


def test_mlp_stats_match_manual_recompute():
    """collect_mlp_stats returns the token-sumsq of silu(gate)*up — the 2SSP
    stage-1 statistic (reference src/pruning.py:271-276)."""
    cfg = dense_cfg()
    p = make(cfg)
    ids = toks(b=1)
    _, aux = deepseek_forward(p, ids, cfg, compute_dtype=F32,
                              collect_mlp_stats=True)
    stats = np.asarray(aux["mlp_stats"])          # [L, 1, f]
    assert stats.shape == (4, 1, 48)

    # manual layer-0 recompute
    from ssp_x_vit_tpu.llm.deepseek import _mla_attention, _rms

    bp = {k: v[0] for k, v in p["dense_blocks"].items()}
    x = p["embed"].astype(F32)[ids]
    attn, _, _ = _mla_attention(_rms(x, bp["ln1"], cfg.rms_eps), bp, cfg, F32)
    x = x + attn
    h = _rms(x, bp["ln2"], cfg.rms_eps)
    hidden = jax.nn.silu(h @ bp["gate_kernel"]) * (h @ bp["up_kernel"])
    manual = np.asarray(jnp.sum(jnp.square(hidden), axis=1))
    np.testing.assert_allclose(stats[0], manual, rtol=1e-4, atol=1e-5)


def test_moe_width_instrumentation_refused():
    cfg = moe_cfg()
    p = make(cfg)
    with pytest.raises(ValueError, match="dense GLU"):
        deepseek_forward(p, toks(), cfg, collect_mlp_stats=True)
    with pytest.raises(ValueError, match="dense GLU"):
        materialize_deepseek_width_pruning(p, cfg, [np.arange(8)] * 4)
    with pytest.raises(ValueError, match="dense"):
        count_main_params_deepseek(cfg)


def test_two_stage_2ssp_end_to_end():
    """Full 2SSP on a dense MLA config: width materialized, attention
    depth-pruned, and the materialized model's perplexity matches the
    gate-parameterized form of the same pruning at f32."""
    cfg = dense_cfg(num_layers=6, hidden_size=48, intermediate_size=96,
                    vocab_size=211, q_lora_rank=24)
    p = make(cfg)
    rs = np.random.RandomState(0)
    calib = [rs.randint(0, 211, (1, 64)).astype(np.int32) for _ in range(2)]

    # force a nonzero stage-2 budget (the auto ratio rounds to 0 attention
    # submodules at toy dims where mlp >> attn)
    out = P.two_stage_2ssp(p, cfg, calib, 0.3, seq_len=64,
                           num_attn_submodules_to_prune=2)
    assert out is not False
    wp, wc, info = out
    assert wc.pruned_intermediate_size == info["num_preserve_mlp"]
    assert tuple(info["pruned_attention_blocks"]) == wc.pruned_attention_blocks
    assert len(info["pruned_attention_blocks"]) == 2

    # achieved sparsity is within one block/neuron rounding of the target
    main0, attn, mlp0 = count_main_params_deepseek(cfg)
    main1, _, _ = count_main_params_deepseek(wc)
    achieved = 1 - main1 / main0
    assert abs(achieved - 0.3) < 0.05

    ppl = evaluate_perplexity(wp, wc, calib[0], seq_len=64)
    assert np.isfinite(ppl) and ppl > 1.0


def test_depth_baseline_masks_and_candidates_moe():
    """window_based / shortGPT / blockpruner drive the MLA family through
    the shared dispatch (block outputs + vmapped gate candidates)."""
    cfg = moe_cfg()
    p = make(cfg)
    rs = np.random.RandomState(1)
    calib = [rs.randint(0, 97, (1, 32)).astype(np.int32) for _ in range(2)]

    m1 = P.window_based(p, cfg, 2, calib)
    assert sum(m1) == 2 and len(m1) == 4
    m2 = P.shortgpt(p, cfg, 2, calib)
    assert sum(m2) == 2
    am, mm = P.blockpruner(p, cfg, 1, calib[0].reshape(-1), seq_len=32)
    assert sum(am) == 1 and sum(mm) == 1

    # vmapped candidate scoring: each row's ppl is finite and the all-ones
    # row equals the plain estimator
    gates = np.ones((3, 4), np.float32)
    gates[1, 0] = 0.0
    gates[2, 2] = 0.0
    ppls = evaluate_perplexity_candidates(p, cfg, calib[0].reshape(-1),
                                          gates, gates, seq_len=32)
    dense_ppl = evaluate_perplexity(p, cfg, calib[0], seq_len=32)
    assert np.all(np.isfinite(ppls))
    np.testing.assert_allclose(ppls[0], dense_ppl, rtol=1e-5)


def test_block_removal_matches_gates_moe():
    cfg = moe_cfg()
    p = make(cfg)
    ids = toks()
    g = jnp.asarray([1.0, 0.0, 0.0, 1.0])
    gated = deepseek_forward(p, ids, cfg, compute_dtype=F32,
                             attn_gate=g, mlp_gate=g)
    pr, cr = materialize_deepseek_block_removal(p, cfg, [1, 2])
    assert cr.num_layers == 2
    assert cr.n_dense_layers == 1 and cr.n_moe_layers == 1
    removed = deepseek_forward(pr, ids, cr, compute_dtype=F32)
    np.testing.assert_allclose(np.asarray(gated), np.asarray(removed),
                               rtol=1e-6, atol=1e-6)


def test_materialized_generate_matches_gated_gold():
    """Greedy generation on an attention-materialized MLA model (compressed
    cache skips pruned layers) == the gold full-recompute gated loop."""
    cfg = moe_cfg()
    p = make(cfg)
    prompt = toks(n=10, b=1)[0]
    ga = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    pm, cm = materialize_deepseek_attention_pruning(p, cfg, [1, 3])

    got = deepseek_generate(pm, cm, prompt, max_new_tokens=6,
                            compute_dtype=F32)
    cur = prompt.tolist()
    for _ in range(6):
        lg = deepseek_forward(p, np.asarray(cur, np.int32)[None], cfg,
                              compute_dtype=F32, attn_gate=ga)
        cur.append(int(jnp.argmax(lg[0, -1])))
    assert got.tolist() == cur


def test_pruned_persistence_roundtrip(tmp_path):
    """Attention-materialized + width-pruned models round-trip through the
    native npz artifact (config tuple fields restored from JSON lists)."""
    cfg = dense_cfg()
    p = make(cfg)
    keeps = [np.sort(np.random.RandomState(i).permutation(48)[:32])
             for i in range(4)]
    wp, wc = materialize_deepseek_width_pruning(p, cfg, keeps)
    pm, cm = materialize_deepseek_attention_pruning(wp, wc, [1])

    out = save_deepseek_model(str(tmp_path / "m"), pm, cm)
    rp, rc = load_deepseek_model(out, dtype=F32)
    assert rc == cm
    assert isinstance(rc.pruned_attention_blocks, tuple)
    ids = toks()
    a = deepseek_forward_materialized(pm, ids, cm, compute_dtype=F32)
    b = deepseek_forward_materialized(rp, ids, rc, compute_dtype=F32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)


def test_hf_export_width_pruned_and_attention_refusal(tmp_path):
    """Width-pruned MLA exports to HF with the pruned intermediate_size and
    reloads with identical logits; attention-materialized export refuses."""
    from ssp_x_vit_tpu.llm.deepseek import export_hf_deepseek, load_hf_deepseek

    cfg = dense_cfg()
    p = make(cfg)
    keeps = [np.sort(np.random.RandomState(i).permutation(48)[:32])
             for i in range(4)]
    wp, wc = materialize_deepseek_width_pruning(p, cfg, keeps)
    out = export_hf_deepseek(str(tmp_path / "hf"), wp, wc)
    rp, rc = load_hf_deepseek(out, dtype=F32)
    assert rc.intermediate_size == 32
    ids = toks()
    a = deepseek_forward(wp, ids, wc, compute_dtype=F32)
    b = deepseek_forward(rp, ids, rc, compute_dtype=F32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)

    pm, cm = materialize_deepseek_attention_pruning(wp, wc, [1])
    with pytest.raises(ValueError, match="no HF encoding"):
        export_hf_deepseek(str(tmp_path / "hf2"), pm, cm)


def test_evopress_runs_on_mla():
    cfg = moe_cfg()
    p = make(cfg)
    rs = np.random.RandomState(2)
    calib = [rs.randint(0, 97, (1, 32)).astype(np.int32) for _ in range(3)]
    from ssp_x_vit_tpu.llm.evopress import evopress

    am, mm = evopress(p, cfg, 1, calib, num_generations=1, seed=0,
                      args=dict(offspring=2, initially_generated=2,
                                initial_tokens=32,
                                tokens_per_selection=(32, 64),
                                survivors_per_selection=(1, 1)))
    assert sum(am) == 1 and sum(mm) == 1
