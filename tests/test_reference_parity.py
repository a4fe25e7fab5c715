"""Semantic-parity regression against the actual reference implementation
(skipped when the read-only reference mount is absent)."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference mount absent")


def test_mask_conjunction_sweep_matches_reference_exactly():
    """Deterministic (random=False) conjunction sweep: all five output series
    (targets, internal att/fc sparsities, effective att/fc sparsities) must
    match the reference's torch implementation bit-for-bit."""
    sys.path.insert(0, os.path.join(REF, "pruning_srp-main"))
    import mask_conjunction as ref

    r = ref.test_unstr_mask_conj(
        64, 16, 4, 10,
        [[ref.DepthPruning, True, True], [ref.WidthPruning, True, True]], False)
    ref_series = [list(map(float, s)) for s in r]

    from ssp_x_vit_tpu.masks.conjunction import (
        ModelDims, mask_conjunction, DepthPruning, WidthPruning,
    )

    targets, ats, fcs, at_ef, fc_ef = [0], [0], [0], [0], [0]
    dims = ModelDims(64, 16, 4, n_blocks=12)
    for i in range(10):
        target = (i + 1) / 10
        res = mask_conjunction(
            dims, [[DepthPruning, True, True], [WidthPruning, True, True]],
            target, (ats[-1], fcs[-1]), random=False)
        targets.append(round(target, 5))
        ats.append(round(res[0], 5))
        fcs.append(round(res[1], 5))
        at_ef.append(round(res[2], 5))
        fc_ef.append(round(res[3], 5))

    for ref_s, ours in zip(ref_series, [targets, ats, fcs, at_ef, fc_ef]):
        np.testing.assert_allclose(ours, ref_s, atol=1e-9)


def test_planner_matches_reference_on_tiny_hf_vit():
    """plan_2ssp_allocation must choose the same (K, t) as the reference
    planner on an identical tiny HF ViT across targets."""
    torch = pytest.importorskip("torch")
    from transformers import ViTConfig as HFViTConfig, ViTForImageClassification

    sys.path.insert(0, REF)
    from src.vit_pruning import plan_2ssp_allocation as ref_plan

    from ssp_x_vit_tpu.models.vit import ViTConfig
    from ssp_x_vit_tpu.pruning import plan_2ssp_allocation

    hf_cfg = HFViTConfig(hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
                         intermediate_size=128, image_size=32, patch_size=16,
                         num_labels=10)
    with torch.no_grad():
        model = ViTForImageClassification(hf_cfg)
    cfg = ViTConfig(image_size=32, patch_size=16, hidden_size=64, num_layers=4,
                    num_heads=4, intermediate_size=128, num_classes=10)

    for target in (0.1, 0.2, 0.3, 0.4):
        ref_p = ref_plan(model, target, min_remaining=16)
        our_p = plan_2ssp_allocation(cfg, target, min_remaining=16)
        assert our_p.blocks_to_prune == ref_p.blocks_to_prune, target
        assert our_p.per_block_neurons_to_prune == ref_p.per_block_neurons_to_prune, target
        assert our_p.estimated_total_removed_params == ref_p.estimated_total_removed_params, target


def test_stage1_width_pruning_matches_reference(tmp_path):
    """Full stage-1 head-to-head on an IDENTICAL tiny HF ViT: activation
    importance agrees (autocast-bf16 vs fp32 tolerance), and pruning with the
    reference's own importance yields matching pruned-model logits."""
    torch = pytest.importorskip("torch")
    from transformers import ViTConfig as HFViTConfig, ViTForImageClassification

    sys.path.insert(0, REF)
    from src.vit_pruning import (
        _compute_ffn_activation_importance as ref_importance,
        prune_vit_mlp_width as ref_prune,
    )

    import jax.numpy as jnp

    from ssp_x_vit_tpu.models.checkpoints import load_hf_vit
    from ssp_x_vit_tpu.models.vit import vit_forward, vit_forward_materialized
    from ssp_x_vit_tpu.pruning import (
        compute_ffn_activation_importance, select_keep_indices,
        materialize_width_pruning,
    )

    hf_cfg = HFViTConfig(hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
                         intermediate_size=128, image_size=32, patch_size=16,
                         num_labels=10)
    torch.manual_seed(0)
    with torch.no_grad():
        model = ViTForImageClassification(hf_cfg).eval()
        model.save_pretrained(tmp_path / "vit")
    params, cfg = load_hf_vit(str(tmp_path / "vit"))

    rng = np.random.default_rng(0)
    px = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    loader = [{"pixel_values": torch.from_numpy(px.transpose(0, 3, 1, 2)),
               "labels": torch.zeros(8, dtype=torch.long)}]
    batches = [{"pixel_values": jnp.asarray(px), "labels": jnp.zeros(8, jnp.int32)}]

    with torch.no_grad():
        ref_imps = ref_importance(model, loader, device="cpu")
    our_imp = compute_ffn_activation_importance(params, cfg, batches)

    for b in range(3):
        r = np.asarray([float(v) for v in ref_imps[b]])
        o = our_imp[b]
        # reference hooks run under cpu autocast (bfloat16): ~0.5% tolerance
        np.testing.assert_allclose(o, r, rtol=2e-2, atol=2e-2)
        # keep-set agreement for the actual prune count
        keep_r = set(np.argsort(-r, kind="stable")[:96].tolist())
        keep_o = set(np.argsort(-o, kind="stable")[:96].tolist())
        assert len(keep_r & keep_o) >= 92  # boundary ties may flip a few

    # Prune BOTH with the reference's importance -> identical keep sets.
    # bf16-quantized scores contain exact ties, which torch's UNSTABLE
    # descending argsort breaks arbitrarily (reference behavior is
    # unspecified there); add a tiny index-dependent tiebreaker so both
    # implementations face a strict ordering.
    ref_np = [np.asarray([float(v) for v in t]) + np.arange(128) * 1e-9
              for t in ref_imps]
    with torch.no_grad():
        res = ref_prune(model, n_to_prune_per_block=[32, 32, 32], min_remaining=16,
                        precomputed_importance=[torch.tensor(t) for t in ref_np],
                        collect_masks=True)
    width = select_keep_indices(np.stack(ref_np), n_to_prune_per_block=[32, 32, 32],
                                min_remaining=16, verbose=False)
    # same pruned index sets as the reference
    for b in range(3):
        assert res["ffn_pruned_indices"][b] == width.pruned_indices[b]

    p2, c2 = materialize_width_pruning(params, cfg, width.keep_indices)
    with torch.no_grad():
        ref_logits = res["model"](
            pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2))).logits.numpy()
    ours = vit_forward_materialized(p2, jnp.asarray(px), c2)
    np.testing.assert_allclose(np.asarray(ours), ref_logits, rtol=3e-4, atol=3e-4)


def test_llm_mlp_importance_matches_reference(tmp_path):
    """2SSP LLM stage-1 statistic head-to-head: reference get_mlp_hidden_state
    hooks vs our fused side-output on an identical tiny LlamaForCausalLM.

    (The reference's stage-2 maskModel monkey-patching no longer runs under
    transformers 4.57 — attention return-arity changed — so the comparison
    covers the hook-based stage-1 path, which still works.)"""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM

    sys.path.insert(0, REF)
    # src.utilities imports src.evaluation which imports the vendored-only
    # lm_eval; stub it (we only need the hook helper).
    import types

    sys.modules.setdefault("lm_eval", types.ModuleType("lm_eval"))
    from src.utilities import get_mlp_hidden_state

    import jax.numpy as jnp

    from ssp_x_vit_tpu.llm.checkpoints import load_hf_llama
    from ssp_x_vit_tpu.llm.pruning import mlp_hidden_importance

    hf_cfg = HFLlamaConfig(vocab_size=96, hidden_size=32, num_hidden_layers=3,
                           num_attention_heads=4, num_key_value_heads=4,
                           intermediate_size=48, max_position_embeddings=64,
                           tie_word_embeddings=False)
    torch.manual_seed(0)
    with torch.no_grad():
        model = LlamaForCausalLM(hf_cfg).eval()
        model.save_pretrained(tmp_path / "llama")
        model.config.model_type = "llama"
    params, cfg = load_hf_llama(str(tmp_path / "llama"), dtype=jnp.float32)

    rng = np.random.default_rng(0)
    samples = [rng.integers(0, 96, (1, 32)).astype(np.int64) for _ in range(3)]

    # reference: per-sample L2 over tokens of the down_proj input, averaged
    avg = [0.0] * 3
    with torch.no_grad():
        for s in samples:
            hs = get_mlp_hidden_state(model, torch.from_numpy(s))
            for li in range(3):
                avg[li] = avg[li] + hs[li].float().norm(dim=0, p=2)
    ref_imp = np.stack([np.asarray((a / len(samples)).numpy()) for a in avg])

    ours = mlp_hidden_importance(params, cfg, [s.astype(np.int32) for s in samples])
    np.testing.assert_allclose(ours, ref_imp, rtol=2e-3, atol=2e-3)
    # identical keep-sets at the 2SSP preserve count
    for li in range(3):
        keep_r = set(np.argsort(-ref_imp[li], kind="stable")[:32].tolist())
        keep_o = set(np.argsort(-ours[li], kind="stable")[:32].tolist())
        assert len(keep_r & keep_o) >= 31


def _score_files(tmp_path, n_files=3):
    import json

    files = []
    for idx in range(n_files):
        rng = np.random.default_rng(idx + 10)
        leaf = {f"{i}:{j}": float(rng.normal() * 3 + 5)
                for i in range(4) for j in range(64)}
        p = tmp_path / f"s{idx}.json"
        p.write_text(json.dumps({"ffn": leaf}))
        files.append(p)
    return files


def test_mask_tool_clis_match_reference(tmp_path):
    """Run the reference's normalize / summation / consensus SCRIPTS and our
    CLIs on identical score files; output JSONs must match exactly."""
    import json
    import subprocess

    files = _score_files(tmp_path)
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")

    def run(cmd, cwd=None):
        r = subprocess.run([sys.executable] + cmd, capture_output=True, text=True,
                           cwd=cwd, env=env)
        assert r.returncode == 0, r.stderr[-1500:]
        return r.stdout

    # --- normalize ---
    ref_norm = tmp_path / "ref_norm"
    our_norm = tmp_path / "our_norm"
    ref_norm.mkdir(); our_norm.mkdir()
    run([f"{REF}/manual-experiments/normalize_scores.py",
         *[str(f) for f in files], "--output-dir", str(ref_norm)])
    run(["-m", "ssp_x_vit_tpu.cli.normalize_scores",
         *[str(f) for f in files], "--out-dir", str(our_norm)], cwd="/root/repo")
    for f in files:
        a = json.loads((ref_norm / f.name).read_text())
        b = json.loads((our_norm / f.name).read_text())
        ra = np.asarray(list(a["ffn"].values()))
        rb = np.asarray([b["ffn"][k] for k in a["ffn"]])
        np.testing.assert_allclose(rb, ra, atol=1e-12)

    norm_files = [str(ref_norm / f.name) for f in files]

    # --- summation aggregate + mask ---
    run([f"{REF}/manual-experiments/aggregate_and_mask-summation.py", *norm_files,
         "--prune", "25",
         "--aggregate-out", str(tmp_path / "ref_agg.json"),
         "--mask-out", str(tmp_path / "ref_mask.json")])
    run(["-m", "ssp_x_vit_tpu.cli.aggregate_and_mask_summation", *norm_files,
         "--prune", "25",
         "--aggregate-out", str(tmp_path / "our_agg.json"),
         "--mask-out", str(tmp_path / "our_mask.json")], cwd="/root/repo")
    ref_agg = json.loads((tmp_path / "ref_agg.json").read_text())["ffn"]
    our_agg = json.loads((tmp_path / "our_agg.json").read_text())["ffn"]
    np.testing.assert_allclose([our_agg[k] for k in ref_agg],
                               list(ref_agg.values()), atol=1e-12)
    ref_mask = json.loads((tmp_path / "ref_mask.json").read_text())["ffn"]
    our_mask = json.loads((tmp_path / "our_mask.json").read_text())["ffn"]
    assert {k: our_mask[k] for k in ref_mask} == ref_mask

    # --- consensus mask ---
    run([f"{REF}/manual-experiments/consensus_mask.py", *norm_files,
         "--prune", "25", "--mask-out", str(tmp_path / "ref_cons.json")])
    run(["-m", "ssp_x_vit_tpu.cli.consensus_mask", *norm_files,
         "--prune", "25", "--mask-out", str(tmp_path / "our_cons.json")],
        cwd="/root/repo")
    ref_cons = json.loads((tmp_path / "ref_cons.json").read_text())["ffn"]
    our_cons = json.loads((tmp_path / "our_cons.json").read_text())["ffn"]
    assert {k: our_cons[k] for k in ref_cons} == ref_cons


def test_perplexity_estimator_matches_reference(tmp_path):
    """Reference evaluate_perplexity (torch, running-mean estimator) vs ours
    on an identical tiny llama + identical token stream."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM

    sys.path.insert(0, REF)
    import types

    sys.modules.setdefault("lm_eval", types.ModuleType("lm_eval"))
    from src.evaluation import evaluate_perplexity as ref_ppl

    import jax.numpy as jnp

    from ssp_x_vit_tpu.llm.checkpoints import load_hf_llama
    from ssp_x_vit_tpu.llm.evaluation import evaluate_perplexity

    hf_cfg = HFLlamaConfig(vocab_size=96, hidden_size=32, num_hidden_layers=2,
                           num_attention_heads=4, num_key_value_heads=4,
                           intermediate_size=48, max_position_embeddings=64,
                           tie_word_embeddings=False)
    torch.manual_seed(0)
    with torch.no_grad():
        model = LlamaForCausalLM(hf_cfg).eval()
        model.save_pretrained(tmp_path / "llama")
    params, cfg = load_hf_llama(str(tmp_path / "llama"), dtype=jnp.float32)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 96, (1, 32 * 5)).astype(np.int64)
    with torch.no_grad():
        r = ref_ppl(model, torch.from_numpy(ids), seq_len=32, enable_tqdm=False,
                    device="cpu")
    o = evaluate_perplexity(params, cfg, ids.astype(np.int32), seq_len=32,
                            enable_tqdm=False)
    assert abs(np.log(o) - np.log(r)) < 1e-3, (o, r)


def test_stage2_copy_mode_selection_matches_reference(tmp_path):
    """Stage-2 copy-mode head-to-head on an IDENTICAL tiny HF ViT: per-block
    bypass accuracies agree and both implementations select the same K blocks.

    The reference's own HFAttentionBypass tuple-return crashes under the
    installed transformers 4.57 (documented in COVERAGE.md), so the reference
    side runs the identical loop structure (src/vit_pruning.py:477-496) with a
    version-compatible tensor-return bypass, plus the reference's own
    selection rule (stable sort over clipped impacts, :496).
    """
    torch = pytest.importorskip("torch")
    import copy

    from transformers import ViTConfig as HFViTConfig, ViTForImageClassification

    sys.path.insert(0, REF)
    from src.vit_pruning import evaluate_top1 as ref_evaluate_top1

    import jax.numpy as jnp

    from ssp_x_vit_tpu.evaluation.classify import evaluate_top1_candidates
    from ssp_x_vit_tpu.models.checkpoints import load_hf_vit
    from ssp_x_vit_tpu.pruning.depth import select_attention_blocks_to_prune

    hf_cfg = HFViTConfig(hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
                         intermediate_size=128, image_size=32, patch_size=16,
                         num_labels=10)
    torch.manual_seed(0)
    with torch.no_grad():
        model = ViTForImageClassification(hf_cfg).eval()
        model.save_pretrained(tmp_path / "vit")
    params, cfg = load_hf_vit(str(tmp_path / "vit"))

    rng = np.random.default_rng(0)
    px = rng.normal(size=(32, 32, 32, 3)).astype(np.float32)
    labels = rng.integers(0, 10, 32)
    loader = [
        {"pixel_values": torch.from_numpy(px[i:i + 16].transpose(0, 3, 1, 2)),
         "labels": torch.from_numpy(labels[i:i + 16])}
        for i in (0, 16)
    ]
    batches = [
        {"pixel_values": jnp.asarray(px[i:i + 16]),
         "labels": jnp.asarray(labels[i:i + 16], jnp.int32)}
        for i in (0, 16)
    ]

    class _Bypass(torch.nn.Module):
        def forward(self, hidden_states, *a, **k):
            return torch.zeros_like(hidden_states)

    L = hf_cfg.num_hidden_layers
    with torch.no_grad():
        ref_baseline = ref_evaluate_top1(model, loader, device="cpu", progress=False)
        ref_scores = []
        for block_idx in range(L):
            mc = copy.deepcopy(model).eval()
            mc.vit.encoder.layer[block_idx].attention = _Bypass()
            ref_scores.append(
                ref_evaluate_top1(mc, loader, device="cpu", progress=False))
    ref_impacts = [max(0.0, ref_baseline - s) for s in ref_scores]
    ref_sel = sorted(sorted(range(L), key=lambda i: ref_impacts[i])[:2])

    gates = np.ones((L + 1, L), np.float32)
    for i in range(L):
        gates[i + 1, i] = 0.0
    accs = evaluate_top1_candidates(params, cfg, batches, gates)
    our_baseline = float(accs[0])
    our_impacts = np.maximum(0.0, our_baseline - np.asarray(accs[1:]))
    our_sel = select_attention_blocks_to_prune(our_impacts, 2)

    # accuracy is a discrete count over 32 images: must agree exactly
    assert our_baseline == pytest.approx(ref_baseline, abs=1e-9)
    np.testing.assert_allclose(np.asarray(accs[1:]), np.asarray(ref_scores),
                               atol=1e-9)
    assert our_sel == ref_sel


# ---------------------------------------------------------------------------
# LLM baseline head-to-heads (VERDICT r2 #2)
# ---------------------------------------------------------------------------

def _tiny_hf_llama(tmp_path, *, layers=5, seed=0, dtype=None):
    """Identical tiny LlamaForCausalLM on both sides: (torch model, our
    (params, cfg))."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM

    import jax.numpy as jnp

    from ssp_x_vit_tpu.llm.checkpoints import load_hf_llama

    hf_cfg = HFLlamaConfig(vocab_size=96, hidden_size=32, num_hidden_layers=layers,
                           num_attention_heads=4, num_key_value_heads=4,
                           intermediate_size=48, max_position_embeddings=128,
                           tie_word_embeddings=False)
    torch.manual_seed(seed)
    with torch.no_grad():
        model = LlamaForCausalLM(hf_cfg).eval()
        model.save_pretrained(tmp_path / "llama")
    if dtype is not None:
        model = model.to(dtype)
        model.config.torch_dtype = dtype
    params, cfg = load_hf_llama(str(tmp_path / "llama"), dtype=jnp.float32)
    return model, params, cfg


def _ref_src():
    import types

    sys.path.insert(0, REF)
    sys.modules.setdefault("lm_eval", types.ModuleType("lm_eval"))


def _compat_intermediate_outputs(model, calibration_set, last_token):
    """Reference compute_intermediate_outputs (src/utilities.py:188-221) with
    a version-compatible hook: transformers 4.57 decoder layers return a raw
    TENSOR, so the reference's `output[0][0, -1]` silently captures a scalar
    (batch 0 / token 0 / last hidden dim) instead of the last-token hidden
    vector. This shim keeps the reference loop structure but indexes the
    tensor return correctly (`output[0, -1]`)."""
    import torch

    outs = []
    for ci in range(len(calibration_set)):
        captured = []

        def hook(module, inp, output):
            hs = output[0] if isinstance(output, tuple) else output
            captured.append(hs[0, -1].to("cpu") if last_token else hs[0].to("cpu"))

        hooks = [layer.register_forward_hook(hook)
                 for layer in model.model.layers]
        with torch.no_grad():
            model(calibration_set[ci])
        outs.append(torch.stack(captured))
        for h in hooks:
            h.remove()
    return outs


def test_window_based_selection_matches_reference(tmp_path, monkeypatch):
    """Sliding-window cosine similarity head-to-head: the reference's
    window_based selection logic (src/pruning.py:29-64) run verbatim — its
    hook helper swapped for the tensor-return-compatible capture (see
    _compat_intermediate_outputs; under transformers 4.57 the original
    silently captures scalars) — must pick the same window as ours on an
    identical tiny llama + identical calibration."""
    torch = pytest.importorskip("torch")

    _ref_src()
    import src.pruning as ref_pruning

    from ssp_x_vit_tpu.llm.pruning import window_based

    monkeypatch.setattr(ref_pruning, "compute_intermediate_outputs",
                        _compat_intermediate_outputs)
    model, params, cfg = _tiny_hf_llama(tmp_path, layers=5)
    rng = np.random.default_rng(3)
    calib = [rng.integers(0, 96, (1, 24)) for _ in range(4)]
    with torch.no_grad():
        ref_mask = ref_pruning.window_based(
            model, 2, [torch.from_numpy(c) for c in calib])
    ours = window_based(params, cfg, 2, [c.astype(np.int32) for c in calib])
    assert ours == ref_mask


def test_shortgpt_selection_matches_reference(tmp_path, monkeypatch):
    """Block-influence (1 - cos(in, out)) head-to-head vs the reference's
    shortGPT selection (src/pruning.py:82-107), with the same
    tensor-return-compatible capture as the window_based test."""
    torch = pytest.importorskip("torch")

    _ref_src()
    import src.pruning as ref_pruning

    from ssp_x_vit_tpu.llm.pruning import shortgpt

    monkeypatch.setattr(ref_pruning, "compute_intermediate_outputs",
                        _compat_intermediate_outputs)
    model, params, cfg = _tiny_hf_llama(tmp_path, layers=5, seed=1)
    rng = np.random.default_rng(4)
    calib = [rng.integers(0, 96, (1, 24)) for _ in range(4)]
    with torch.no_grad():
        ref_mask = ref_pruning.shortGPT(
            model, 2, [torch.from_numpy(c) for c in calib])
    ours = shortgpt(params, cfg, 2, [c.astype(np.int32) for c in calib])
    assert ours == ref_mask


def test_blockpruner_selection_matches_reference(tmp_path):
    """BlockPruner greedy submodule removal head-to-head (reference
    src/pruning.py:127-194).

    The reference's own maskModel attention patch returns a 3-tuple that
    crashes under the installed transformers 4.57 (layer unpacks 2), so the
    reference side runs the IDENTICAL loop structure with an
    arity-compatible mask of the same semantics (attention -> 0 so the
    residual passes through; MLP -> 0), plus the reference's own `<` argmin
    rule."""
    torch = pytest.importorskip("torch")
    from types import MethodType

    _ref_src()
    from src.evaluation import evaluate_perplexity as ref_ppl

    from ssp_x_vit_tpu.llm.pruning import blockpruner

    model, params, cfg = _tiny_hf_llama(tmp_path, layers=4, seed=2)
    rng = np.random.default_rng(5)
    sample = rng.integers(0, 96, (1, 64))
    sample_t = torch.from_numpy(sample)

    def mask(attn_mask, mlp_mask):
        for i, (a, m) in enumerate(zip(attn_mask, mlp_mask)):
            layer = model.model.layers[i]
            if a:
                layer.self_attn.forward_bak = layer.self_attn.forward
                layer.self_attn.forward = MethodType(
                    lambda self, hidden_states, *args, **kw: (0, None),
                    layer.self_attn)
            if m:
                layer.mlp.forward_bak = layer.mlp.forward
                layer.mlp.forward = MethodType(
                    lambda self, hidden_states, *args, **kw: 0, layer.mlp)

    def unmask(attn_mask, mlp_mask):
        for i, (a, m) in enumerate(zip(attn_mask, mlp_mask)):
            layer = model.model.layers[i]
            if a:
                layer.self_attn.forward = layer.self_attn.forward_bak
            if m:
                layer.mlp.forward = layer.mlp.forward_bak

    L = 4
    ref_attn, ref_mlp = [0] * L, [0] * L
    with torch.no_grad():
        for _ in range(1):
            for which, base in (("attn", ref_attn), ("mlp", ref_mlp)):
                best_to_prune, best_ppl = None, float("inf")
                for to_prune in range(L):
                    if base[to_prune] == 1:
                        continue
                    base[to_prune] = 1
                    mask(ref_attn, ref_mlp)
                    ppl = ref_ppl(model, sample_t, seq_len=32,
                                  enable_tqdm=False, device="cpu")
                    unmask(ref_attn, ref_mlp)
                    base[to_prune] = 0
                    if ppl < best_ppl:
                        best_ppl, best_to_prune = ppl, to_prune
                base[best_to_prune] = 1

    our_attn, our_mlp = blockpruner(params, cfg, 1, sample.astype(np.int32),
                                    seq_len=32)
    assert our_attn == ref_attn
    assert our_mlp == ref_mlp


def test_slicegpt_e2e_perplexity_matches_reference(tmp_path):
    """SliceGPT end-to-end head-to-head: the VENDORED rotation engine
    (layernorm fusion -> per-layer PCA rotation -> slicing,
    src/slicegpt_utils/rotate.py:124-251) run at f64 on an identical tiny
    llama + identical calibration vs our host-f64 engine; final wikitext-style
    perplexities must agree.

    The vendored CompressedLlamaDecoderLayer unpacks the attention output as
    a 3-tuple, which crashes under the installed transformers 4.57 — its
    forward is re-bound with the IDENTICAL dataflow (shortcut_Q rotated
    residuals, llama_adapter.py:25-89) at the current 2-tuple arity.
    final_orientation='pca' on both sides (deterministic; 'random' draws from
    different RNGs)."""
    torch = pytest.importorskip("torch")

    _ref_src()
    from src.evaluation import evaluate_perplexity as ref_ppl
    from src.slicegpt_utils import layernorm_fusion, rotate
    from src.slicegpt_utils.adapters import llama_adapter as la
    from src.slicegpt_utils.slicing_scheduler import ConstSlicingScheduler

    from ssp_x_vit_tpu.llm.slicegpt import evaluate_perplexity_sliced, slicegpt

    model, params, cfg = _tiny_hf_llama(tmp_path, layers=2, seed=3,
                                        dtype=torch.float64)

    def compat_forward(self, hidden_states, *args, **kwargs):
        from torch import matmul

        residual = hidden_states
        hidden_states = self.input_layernorm(hidden_states)
        hidden_states, _ = self.self_attn(hidden_states=hidden_states,
                                          *args, **kwargs)
        if self.attn_shortcut_Q is not None:
            hidden_states = matmul(residual, self.attn_shortcut_Q) + hidden_states
        else:
            hidden_states = residual + hidden_states
        residual = hidden_states
        hidden_states = self.post_attention_layernorm(hidden_states)
        hidden_states = self.mlp(hidden_states)
        if self.mlp_shortcut_Q is not None:
            hidden_states = matmul(residual, self.mlp_shortcut_Q) + hidden_states
        else:
            hidden_states = residual + hidden_states
        return hidden_states

    orig_forward = la.CompressedLlamaDecoderLayer.forward
    la.CompressedLlamaDecoderLayer.forward = compat_forward
    try:
        adapter = la.LlamaModelAdapter(model)
        layernorm_fusion.replace_layers(adapter)
        layernorm_fusion.fuse_modules(adapter)

        rng = np.random.default_rng(6)
        calib = [rng.integers(0, 96, (1, 32)) for _ in range(4)]
        new_dim = 24  # int((1 - 0.25) * 32), already /8-aligned
        sched = ConstSlicingScheduler(new_dim)
        with torch.no_grad():
            rotate.rotate_and_slice(adapter, [torch.from_numpy(c) for c in calib],
                                    sched, apply_mask=False,
                                    final_orientation="pca")
            eval_ids = rng.integers(0, 96, (1, 32 * 4))
            r = ref_ppl(adapter.model, torch.from_numpy(eval_ids), seq_len=32,
                        enable_tqdm=False, device="cpu")
    finally:
        la.CompressedLlamaDecoderLayer.forward = orig_forward

    sliced_params, scfg = slicegpt(params, cfg, 0.25,
                                   [c.astype(np.int32) for c in calib],
                                   final_orientation="pca")
    assert scfg.new_dim == new_dim
    o = evaluate_perplexity_sliced(sliced_params, scfg,
                                   eval_ids.astype(np.int32), seq_len=32)
    assert abs(np.log(o) - np.log(r)) < 2e-2, (o, r)


# ---------------------------------------------------------------------------
# EvoPress head-to-heads (VERDICT r3 #3)
# ---------------------------------------------------------------------------

def test_evopress_collect_samples_matches_reference():
    """Sample-joining calibration builder head-to-head: identical windows
    (join, trim-to-length, separator-append, reset) for the same document
    stream (reference src/evopress.py:13-49)."""
    torch = pytest.importorskip("torch")

    _ref_src()
    from src.evopress import collect_samples_with_join as ref_collect

    from ssp_x_vit_tpu.llm.evopress import collect_samples_with_join

    rng = np.random.default_rng(0)
    # ragged documents: some shorter than the window (separator join), some
    # overflowing it (trim + remainder discard)
    docs = [rng.integers(5, 90, rng.integers(3, 40)).astype(np.int64)
            for _ in range(40)]
    SEP = [91, 92]  # plays the role of tokenizer("\n\n").input_ids

    class _StubTok:
        """Maps 'doc<i>' -> pre-tokenized ids (the reference tokenizes text;
        the joining logic under test is token-level)."""

        def __call__(self, text, return_tensors="pt", add_special_tokens=False):
            class R:
                pass

            r = R()
            ids = SEP if text == "\n\n" else docs[int(text[3:])]
            r.input_ids = torch.as_tensor(np.asarray(ids, np.int64)[None])
            return r

    dataset = [{"text": f"doc{i}"} for i in range(len(docs))]
    ref = ref_collect(dataset, _StubTok(), num_samples=5, sequence_length=24)
    ours = collect_samples_with_join(docs, 5, 24, separator_ids=SEP)

    assert len(ours) == len(ref)
    for a, b in zip(ours, ref):
        np.testing.assert_array_equal(a, b.numpy())


def test_evopress_selection_matches_reference(tmp_path):
    """Selection head-to-head on an identical tiny HF llama: same seeded
    minibatch draw (budget join + trim), same KL fitness ordering, same
    survivors (reference src/evopress.py:103-145).

    The reference's maskModel tuple-returns crash under the installed
    transformers 4.57 (decoder layers now return raw tensors and
    ``hidden_states, _ = self_attn(...)`` unpacks a 2-tuple — same class of
    break as HFAttentionBypass, COVERAGE.md); the reference side runs its
    own selection()/compute_kl_div untouched with a version-compatible
    mask/unmask shim patched in."""
    import random as pyrandom

    torch = pytest.importorskip("torch")

    _ref_src()
    import src.evopress as ref_ev

    import jax.numpy as jnp

    from ssp_x_vit_tpu.llm import evopress as our_ev

    model, params, cfg = _tiny_hf_llama(tmp_path, layers=5, seed=1)
    L = 5

    def compat_mask(model, attnMask, mlpMask):
        from types import MethodType

        for i, layer in enumerate(model.model.layers):
            if attnMask[i] == 1 and mlpMask[i] == 1:
                layer.forward_bak = layer.forward
                layer.forward = MethodType(
                    lambda self, hidden_states, *a, **k: hidden_states, layer)
            elif attnMask[i] == 1:
                sa = layer.self_attn
                sa.forward_bak = sa.forward
                sa.forward = MethodType(
                    lambda self, hidden_states, *a, **k:
                    (torch.zeros_like(hidden_states), None), sa)
            elif mlpMask[i] == 1:
                mlp = layer.mlp
                mlp.forward_bak = mlp.forward
                mlp.forward = MethodType(
                    lambda self, hidden_states, *a, **k:
                    torch.zeros_like(hidden_states), mlp)

    def compat_unmask(model, attnMask, mlpMask):
        for i, layer in enumerate(model.model.layers):
            if attnMask[i] == 1 and mlpMask[i] == 1:
                layer.forward = layer.forward_bak
            elif attnMask[i] == 1:
                layer.self_attn.forward = layer.self_attn.forward_bak
            elif mlpMask[i] == 1:
                layer.mlp.forward = layer.mlp.forward_bak

    rng = np.random.default_rng(2)
    S, NW = 64, 8
    cal_np = [rng.integers(1, 90, (1, S)).astype(np.int64) for _ in range(NW)]
    cal_torch = [torch.from_numpy(c) for c in cal_np]
    with torch.no_grad():
        tgt_torch = [model(c).logits.float() for c in cal_torch]

    dense = jnp.ones((L,), jnp.float32)
    tgt_ours = [np.asarray(our_ev._logits(
        params, jnp.asarray(c, jnp.int32), dense, dense, cfg))
        for c in cal_np]

    # candidates ablating distinct structures -> well-separated fitnesses
    cands = []
    for i in range(L):
        c = {"attn": [0] * L, "mlp": [0] * L}
        c["attn"][i] = 1
        if i % 2:
            c["mlp"][(i + 2) % L] = 1
        cands.append(c)
    cands.append({"attn": [0] * L, "mlp": [1] + [0] * (L - 1)})

    # budget 200 over 64-token windows: joins 3 full windows + one trimmed
    orig_mask, orig_unmask = ref_ev.maskModel, ref_ev.unmaskModel
    ref_ev.maskModel, ref_ev.unmaskModel = compat_mask, compat_unmask
    try:
        pyrandom.seed(7)
        with torch.no_grad():
            ref_surv, ref_fit = ref_ev.selection(
                model, [dict(attn=list(c["attn"]), mlp=list(c["mlp"]))
                        for c in cands],
                num_survive=3, calibration_data=cal_torch, num_tokens=200,
                target_logits=tgt_torch)
    finally:
        ref_ev.maskModel, ref_ev.unmaskModel = orig_mask, orig_unmask

    our_surv, our_fit = our_ev.selection(
        params, cfg, [dict(attn=list(c["attn"]), mlp=list(c["mlp"]))
                      for c in cands],
        3, cal_np, 200, tgt_ours, pyrandom.Random(7))

    assert our_surv == ref_surv          # same masks, same order
    np.testing.assert_allclose(our_fit, ref_fit, rtol=0.05)


# ---------------------------------------------------------------------------
# Ablation-suite head-to-heads (VERDICT r3 #5)
# ---------------------------------------------------------------------------

def _compat_mask_model(model, attnMask, mlpMask):
    """Reference maskModel semantics (src/utilities.py:69-111) at the
    installed transformers 4.57 arity: decoder layers return raw tensors and
    self_attn returns a 2-tuple, so the reference's own 3-tuple/1-tuple
    monkeypatches crash (same shim as the EvoPress head-to-head)."""
    import torch
    from types import MethodType

    for i, layer in enumerate(model.model.layers):
        if attnMask[i] == 1 and mlpMask[i] == 1:
            layer.forward_bak = layer.forward
            layer.forward = MethodType(
                lambda self, hidden_states, *a, **k: hidden_states, layer)
        elif attnMask[i] == 1:
            sa = layer.self_attn
            sa.forward_bak = sa.forward
            sa.forward = MethodType(
                lambda self, hidden_states, *a, **k:
                (torch.zeros_like(hidden_states), None), sa)
        elif mlpMask[i] == 1:
            mlp = layer.mlp
            mlp.forward_bak = mlp.forward
            mlp.forward = MethodType(
                lambda self, hidden_states, *a, **k:
                torch.zeros_like(hidden_states), mlp)


def _compat_unmask_model(model, attnMask, mlpMask):
    for i, layer in enumerate(model.model.layers):
        if attnMask[i] == 1 and mlpMask[i] == 1:
            layer.forward = layer.forward_bak
        elif attnMask[i] == 1:
            layer.self_attn.forward = layer.self_attn.forward_bak
        elif mlpMask[i] == 1:
            layer.mlp.forward = layer.mlp.forward_bak


def _patch_ref_for_cpu(monkeypatch, seq_len):
    """Run the reference's stage-2 loop VERBATIM on this host: its inner
    evaluate_perplexity hardcodes seq_len=2048/device='cuda'
    (src/utilities.py:452) and its maskModel crashes under transformers 4.57
    — swap those primitives in the namespaces that hold them, leaving the
    selection loops (second_stage_attention, two_stage_2ssp) untouched."""
    import src.ablations as ref_abl
    import src.pruning as ref_pruning
    import src.utilities as ref_utils
    from src.evaluation import evaluate_perplexity as ref_ppl

    def cpu_ppl(model, input_ids, seq_len=2048, batch_size=1,
                enable_tqdm=True, device="cuda"):
        return ref_ppl(model, input_ids, seq_len=globals()["_REF_SEQ"],
                       enable_tqdm=False, device="cpu")

    globals()["_REF_SEQ"] = seq_len
    monkeypatch.setattr(ref_utils, "evaluate_perplexity", cpu_ppl)
    monkeypatch.setattr(ref_utils, "maskModel", _compat_mask_model)
    monkeypatch.setattr(ref_utils, "unmaskModel", _compat_unmask_model)
    monkeypatch.setattr(ref_pruning, "maskModel", _compat_mask_model)
    monkeypatch.setattr(ref_abl, "maskModel", _compat_mask_model)
    return ref_ppl


def _assert_keep_sets_tie_equal(ref_keep, our_keep, importance, rel_tol=5e-3):
    """Selection-set equality up to numeric boundary ties: the two keep sets
    may differ only in elements whose importances all sit within ``rel_tol``
    of each other (a swap across the cut line is legitimate when the two
    frameworks' f32 reductions land 1e-6 apart on near-equal scores)."""
    ref_s, our_s = set(map(int, ref_keep)), set(map(int, our_keep))
    assert len(ref_s) == len(our_s)
    swapped = sorted(ref_s ^ our_s)
    assert len(swapped) <= 2 * max(1, len(ref_s) // 8), swapped
    if swapped:
        vals = np.asarray([importance[i] for i in swapped], np.float64)
        scale = float(np.max(np.abs(np.asarray(importance))))
        assert vals.max() - vals.min() <= rel_tol * scale, (swapped, vals)


def test_one_stage_2ssp_selection_matches_reference(tmp_path, monkeypatch):
    """Stage-1-only ablation head-to-head (reference src/ablations.py:88-126):
    same mlp_pruning_rate arithmetic, same L2 token-norm importance, same
    keep sets (up to numeric boundary ties) on an identical tiny llama +
    identical calibration."""
    torch = pytest.importorskip("torch")

    _ref_src()
    import src.ablations as ref_abl

    from ssp_x_vit_tpu.llm.ablations import one_stage_keep_indices
    from ssp_x_vit_tpu.llm.pruning import mlp_hidden_importance

    model, params, cfg = _tiny_hf_llama(tmp_path, layers=5, seed=4)
    rng = np.random.default_rng(11)
    calib = [rng.integers(0, 96, (1, 24)) for _ in range(4)]

    recorded = {}

    def record_prune_mlp(model, mask, block_i):
        recorded[block_i] = np.where(np.asarray(mask) == 0)[0]

    monkeypatch.setattr(ref_abl, "prune_mlp", record_prune_mlp)
    with torch.no_grad():
        ref_abl.one_stage_2ssp(model, [torch.from_numpy(c) for c in calib],
                               0.25)

    calib_np = [c.astype(np.int32) for c in calib]
    keep, num_preserve = one_stage_keep_indices(params, cfg, calib_np, 0.25)
    importance = mlp_hidden_importance(params, cfg, calib_np)
    assert len(recorded) == 5
    for li in range(5):
        assert recorded[li].size == num_preserve
        _assert_keep_sets_tie_equal(recorded[li], keep[li], importance[li])


def test_inverted_2ssp_matches_reference(tmp_path, monkeypatch):
    """Rows/cols-inverted ablation head-to-head (reference
    src/ablations.py:169-255): same keep_in/keep_out hidden-dim sets (up to
    numeric boundary ties), then — materializing the REFERENCE's keep sets
    on our side so boundary ties can't fork the models — the same pruned
    attention blocks and the same final eval perplexity (our zero-scatter
    masking is mathematically the reference's slice + scatter forward)."""
    torch = pytest.importorskip("torch")

    _ref_src()
    import src.ablations as ref_abl
    import src.utilities as ref_utils

    from ssp_x_vit_tpu.llm import ablations as A
    from ssp_x_vit_tpu.llm import pruning as P
    from ssp_x_vit_tpu.llm.evaluation import evaluate_perplexity as our_ppl

    SEQ = 24
    ref_ppl = _patch_ref_for_cpu(monkeypatch, SEQ)
    model, params, cfg = _tiny_hf_llama(tmp_path, layers=5, seed=5)
    rng = np.random.default_rng(12)
    calib = [rng.integers(0, 96, (1, SEQ)) for _ in range(4)]
    calib_np = [c.astype(np.int32) for c in calib]

    recorded = {}
    real_inverted = ref_abl.prune_mlp_inverted

    def record_inverted(model, mask_inputs, mask_outputs, layer_i):
        recorded[layer_i] = (np.where(np.asarray(mask_inputs) == 0)[0],
                             np.where(np.asarray(mask_outputs) == 0)[0])
        return real_inverted(model, mask_inputs, mask_outputs, layer_i)

    monkeypatch.setattr(ref_abl, "prune_mlp_inverted", record_inverted)

    captured = {}
    real_stage2 = ref_utils.second_stage_attention

    def record_stage2(model, num_prune, calibration_input_ids):
        captured["num_prune"] = num_prune
        out = real_stage2(model, num_prune, calibration_input_ids)
        captured["attn_mask"] = list(out[0])
        return out

    monkeypatch.setattr(ref_abl, "second_stage_attention", record_stage2)

    with torch.no_grad():
        ref_model = ref_abl.two_stage_2ssp_inverted(
            model, [torch.from_numpy(c) for c in calib], 0.25)
    assert ref_model is not False

    # selection head-to-head (tie-aware)
    imp_in, imp_out = A.mlp_io_importance(params, cfg, calib_np)
    num_preserve = recorded[0][0].size
    for li in range(5):
        keep_in_ours = np.sort(np.argsort(-imp_in[li], kind="stable")[:num_preserve])
        keep_out_ours = np.sort(np.argsort(-imp_out[li], kind="stable")[:num_preserve])
        _assert_keep_sets_tie_equal(recorded[li][0], keep_in_ours, imp_in[li])
        _assert_keep_sets_tie_equal(recorded[li][1], keep_out_ours, imp_out[li])

    # stage-2 + e2e ppl head-to-head on IDENTICAL masked models: apply the
    # reference's keep sets on our side (reference prune_mlp_inverted's
    # slice+scatter == our zero-scatter), then our stage-2 must pick the
    # same attention blocks and land on the same perplexity.
    masked = A.materialize_inverted_mlp_pruning(
        params, cfg, [recorded[li][0] for li in range(5)],
        [recorded[li][1] for li in range(5)])
    calib_cat = np.concatenate([c.reshape(-1) for c in calib_np[:1]])
    attn_mask, _ = P.second_stage_attention(
        masked, cfg, captured["num_prune"], calib_cat, seq_len=SEQ)
    pruned = [i for i, m in enumerate(attn_mask) if m == 1]
    ref_pruned = [i for i, m in enumerate(captured["attn_mask"]) if m == 1]
    assert pruned == ref_pruned

    p2, c2 = P.materialize_llm_depth_pruning(masked, cfg, pruned)
    eval_ids = rng.integers(0, 96, (1, SEQ * 4))
    with torch.no_grad():
        r = ref_ppl(ref_model, torch.from_numpy(eval_ids), seq_len=SEQ,
                    enable_tqdm=False, device="cpu")
    o = our_ppl(p2, c2, eval_ids.astype(np.int32), seq_len=SEQ,
                enable_tqdm=False)
    assert abs(np.log(o) - np.log(r)) < 2e-2, (o, r)


def test_l1_2ssp_matches_reference(tmp_path, monkeypatch):
    """L1-token-norm 2SSP ablation head-to-head (reference
    src/ablations.py:260-343): same keep sets under the p=1 importance, same
    pruned attention blocks, same final eval perplexity."""
    torch = pytest.importorskip("torch")

    _ref_src()
    import src.ablations as ref_abl
    import src.utilities as ref_utils

    from ssp_x_vit_tpu.llm.ablations import two_stage_2ssp_l1_norm
    from ssp_x_vit_tpu.llm.evaluation import evaluate_perplexity as our_ppl

    SEQ = 24
    ref_ppl = _patch_ref_for_cpu(monkeypatch, SEQ)
    model, params, cfg = _tiny_hf_llama(tmp_path, layers=5, seed=6)
    rng = np.random.default_rng(13)
    calib = [rng.integers(0, 96, (1, SEQ)) for _ in range(4)]

    recorded = {}
    real_prune = ref_utils.prune_mlp

    def record_prune_mlp(model, mask, block_i):
        recorded[block_i] = np.where(np.asarray(mask) == 0)[0]
        return real_prune(model, mask, block_i)

    monkeypatch.setattr(ref_abl, "prune_mlp", record_prune_mlp)

    captured = {}
    real_stage2 = ref_utils.second_stage_attention

    def record_stage2(model, num_prune, calibration_input_ids):
        out = real_stage2(model, num_prune, calibration_input_ids)
        captured["attn_mask"] = list(out[0])
        return out

    monkeypatch.setattr(ref_abl, "second_stage_attention", record_stage2)

    with torch.no_grad():
        ref_model = ref_abl.two_stage_2ssp_l1_norm(
            model, [torch.from_numpy(c) for c in calib], 0.25)
    assert ref_model is not False

    out = two_stage_2ssp_l1_norm(params, cfg,
                                 [c.astype(np.int32) for c in calib],
                                 0.25, seq_len=SEQ)
    assert out is not False
    p2, c2, info = out

    for li in range(5):
        np.testing.assert_array_equal(recorded[li], info["keep"][li])
    ref_pruned = [i for i, m in enumerate(captured["attn_mask"]) if m == 1]
    assert info["pruned_attention_blocks"] == ref_pruned

    eval_ids = rng.integers(0, 96, (1, SEQ * 4))
    with torch.no_grad():
        r = ref_ppl(ref_model, torch.from_numpy(eval_ids), seq_len=SEQ,
                    enable_tqdm=False, device="cpu")
    o = our_ppl(p2, c2, eval_ids.astype(np.int32), seq_len=SEQ,
                enable_tqdm=False)
    assert abs(np.log(o) - np.log(r)) < 2e-2, (o, r)


def test_calibration_sweep_matches_reference(tmp_path, monkeypatch):
    """2-point calibration-size sweep head-to-head (reference
    src/ablations.py:22-64 drives two_stage_2ssp per (size, seed) and
    reports eval ppl): at calibration sizes 2 and 4 with identical windows,
    the full reference 2SSP pipeline and ours land on the same perplexity."""
    import copy

    torch = pytest.importorskip("torch")

    _ref_src()
    import src.pruning as ref_pruning

    from ssp_x_vit_tpu.llm.evaluation import evaluate_perplexity as our_ppl
    from ssp_x_vit_tpu.llm.pruning import two_stage_2ssp

    SEQ = 24
    ref_ppl = _patch_ref_for_cpu(monkeypatch, SEQ)
    model0, params, cfg = _tiny_hf_llama(tmp_path, layers=5, seed=7)
    rng = np.random.default_rng(14)
    calib = [rng.integers(0, 96, (1, SEQ)) for _ in range(4)]
    eval_ids = rng.integers(0, 96, (1, SEQ * 4))

    for cs in (2, 4):
        # the reference sweep reloads the model per point (ablations.py:38)
        model = copy.deepcopy(model0)
        with torch.no_grad():
            ref_model = ref_pruning.two_stage_2ssp(
                model, [torch.from_numpy(c) for c in calib[:cs]], 0.5)
            assert ref_model is not False
            r = ref_ppl(ref_model, torch.from_numpy(eval_ids), seq_len=SEQ,
                        enable_tqdm=False, device="cpu")

        out = two_stage_2ssp(params, cfg,
                             [c.astype(np.int32) for c in calib[:cs]],
                             0.5, seq_len=SEQ)
        assert out is not False
        p2, c2, _ = out
        o = our_ppl(p2, c2, eval_ids.astype(np.int32), seq_len=SEQ,
                    enable_tqdm=False)
        assert abs(np.log(o) - np.log(r)) < 2e-2, (cs, o, r)
