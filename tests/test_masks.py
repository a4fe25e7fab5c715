"""Mask algebra: codec round-trip, normalize, summation, consensus, conjunction."""

import json

import numpy as np

from ssp_x_vit_tpu.masks import (
    find_leaf_ij_dicts,
    reconstruct_tree,
    normalize_structure,
    aggregate_leaves,
    make_mask_for_leaf,
    consensus_for_path,
    mask_conjunction,
    DepthPruning,
    WidthPruning,
)
from ssp_x_vit_tpu.masks.conjunction import ModelDims
from ssp_x_vit_tpu.masks.normalize import scan_min_max


def _leaf(L=3, F=8, seed=0):
    rng = np.random.default_rng(seed)
    return {f"{i}:{j}": float(rng.random()) for i in range(L) for j in range(F)}


def test_codec_roundtrip():
    tree = {"ffn": _leaf(), "meta": {"note": "x"}}
    leaves = find_leaf_ij_dicts(tree)
    assert len(leaves) == 1 and leaves[0][0] == ("ffn",)
    rebuilt = reconstruct_tree(dict(leaves))
    assert rebuilt["ffn"] == tree["ffn"]


def test_normalize():
    tree = {"a": {"0:0": 2.0, "0:1": 4.0}, "b": 6.0}
    lo, hi = scan_min_max(tree)
    assert (lo, hi) == (2.0, 6.0)
    norm = normalize_structure(tree, lo, hi)
    assert norm["a"]["0:0"] == 0.0 and norm["b"] == 1.0
    assert abs(norm["a"]["0:1"] - 0.5) < 1e-12


def test_summation_mask(tmp_path):
    l1, l2 = _leaf(seed=1), _leaf(seed=2)
    f1, f2 = tmp_path / "a.json", tmp_path / "b.json"
    f1.write_text(json.dumps({"ffn": l1}))
    f2.write_text(json.dumps({"ffn": l2}))
    sums = aggregate_leaves([f1, f2])
    assert ("ffn",) in sums
    agg = sums[("ffn",)]
    for k in l1:
        assert abs(agg[k] - (l1[k] + l2[k])) < 1e-12

    mask = make_mask_for_leaf(agg, prune_fraction=0.25)
    # equal K per block: 25% of 8 = 2 per block
    for i in range(3):
        assert sum(v for k, v in mask.items() if k.startswith(f"{i}:")) == 2
    # pruned = smallest aggregated values per block
    for i in range(3):
        block = {k: agg[k] for k in agg if k.startswith(f"{i}:")}
        chosen = {k for k, v in mask.items() if k.startswith(f"{i}:") and v == 1}
        smallest = set(sorted(block, key=block.get)[:2])
        assert chosen == smallest


def test_summation_mask_missing_keys_sum_as_zero(tmp_path):
    f1, f2 = tmp_path / "a.json", tmp_path / "b.json"
    f1.write_text(json.dumps({"ffn": {"0:0": 1.0, "0:1": 2.0}}))
    f2.write_text(json.dumps({"ffn": {"0:1": 3.0, "0:2": 4.0}}))
    agg = aggregate_leaves([f1, f2])[("ffn",)]
    assert agg == {"0:0": 1.0, "0:1": 5.0, "0:2": 4.0}


def test_consensus_basic():
    # two files agree on the lowest neurons -> intersection immediately full
    l1 = {f"0:{j}": float(j) for j in range(10)}
    l2 = {f"0:{j}": float(j) * 2 for j in range(10)}
    mask = consensus_for_path([l1, l2], prune_fraction=0.3, verbose=False)
    assert sum(mask.values()) == 3
    assert mask["0:0"] == 1 and mask["0:1"] == 1 and mask["0:2"] == 1


def test_consensus_needs_growth():
    # disagreeing orders: intersection of bottom-k grows only for larger t
    rng = np.random.default_rng(0)
    v1 = rng.permutation(20).astype(float)
    v2 = rng.permutation(20).astype(float)
    l1 = {f"0:{j}": float(v1[j]) for j in range(20)}
    l2 = {f"0:{j}": float(v2[j]) for j in range(20)}
    mask = consensus_for_path([l1, l2], prune_fraction=0.25, verbose=False)
    assert sum(mask.values()) == 5  # exactly K_common
    # every pruned key must be in both files' (grown) bottom sets: weak check —
    # pruned keys have below-median mean score
    means = {k: (l1[k] + l2[k]) / 2 for k in l1}
    pruned_means = [means[k] for k, v in mask.items() if v == 1]
    assert np.mean(pruned_means) < np.mean(list(means.values()))


def test_conjunction_deterministic_sweep():
    dims = ModelDims(64, 16, 4, n_blocks=4)
    at, fc, at_ef, fc_ef = mask_conjunction(
        dims, [[DepthPruning, True, True], [WidthPruning, True, True]],
        target=0.3, random=False,
    )
    assert at_ef >= 0.3 and fc_ef >= 0.3
    assert 0.3 <= at <= 1.0 and 0.3 <= fc <= 1.0


def test_conjunction_single_method_identity():
    # with one method the conjunction equals that method's own mask,
    # so internal sparsity should not need to grow beyond ~target + step
    dims = ModelDims(32, 8, 4, n_blocks=4)
    at, fc, at_ef, fc_ef = mask_conjunction(
        dims, [[DepthPruning, True, True]], target=0.5, random=False,
    )
    assert at_ef >= 0.5 and fc_ef >= 0.5
    assert at <= 0.51 + 0.25  # depth quantizes to whole blocks (1/4 steps)
