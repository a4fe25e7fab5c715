"""Offline task packs (llm/taskpack.py): build, load, evaluate, CLI fallback."""

import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params
from ssp_x_vit_tpu.llm.taskpack import (build_code_cloze_pack,
                                        evaluate_task_pack, load_task_pack)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = LlamaConfig(vocab_size=512, hidden_size=32, num_layers=2, num_heads=4,
                  num_kv_heads=4, intermediate_size=64)


@pytest.fixture(scope="module")
def pack_dir(tmp_path_factory):
    files = sorted(glob.glob(os.path.join(REPO, "ssp_x_vit_tpu/llm/*.py")))
    out = tmp_path_factory.mktemp("pack")
    path = build_code_cloze_pack(files, str(out), n_examples=12,
                                 context_lines=4, seed=0)
    assert os.path.exists(path)
    return str(out)


def test_build_format(pack_dir):
    tasks = load_task_pack(pack_dir)
    assert "code_cloze" in tasks
    t = tasks["code_cloze"]
    assert t["length_normalized"] is True
    assert len(t["examples"]) == 12
    for ex in t["examples"]:
        assert len(ex["choices"]) == 4
        assert 0 <= ex["label"] < 4
        assert ex["context"].endswith("\n")
        # the labeled choice is a real line (distractors come from other
        # files so identical text would make the example unanswerable)
        others = [c for i, c in enumerate(ex["choices"]) if i != ex["label"]]
        assert ex["choices"][ex["label"]].strip() not in \
            [c.strip() for c in others]


def test_build_deterministic(pack_dir, tmp_path):
    files = sorted(glob.glob(os.path.join(REPO, "ssp_x_vit_tpu/llm/*.py")))
    p2 = build_code_cloze_pack(files, str(tmp_path), n_examples=12,
                               context_lines=4, seed=0)
    a = open(os.path.join(pack_dir, "code_cloze.jsonl")).read()
    assert open(p2).read() == a


def test_evaluate_task_pack(pack_dir):
    params = init_llama_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)

    def encode(s):
        return [int(b) for b in s.encode("utf-8")[:96]]

    res = evaluate_task_pack(params, CFG, pack_dir, encode, limit=4,
                             bucket=64)
    r = res["code_cloze"]
    assert r["count"] == 4
    assert 0.0 <= r["acc"] <= 1.0


def test_downstream_fallback_uses_pack(pack_dir, tmp_path, monkeypatch):
    """evaluation_downstream: harness unavailable -> offline pack leg."""
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    from ssp_x_vit_tpu.llm import downstream, harness_compat

    # train a tiny local tokenizer.json so the model dir is self-contained
    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    trainer = trainers.BpeTrainer(
        vocab_size=300, special_tokens=[],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(["def f(x):\n    return x + 1\n"] * 4, trainer)
    model_dir = tmp_path / "model"
    model_dir.mkdir()
    tok.save(str(model_dir / "tokenizer.json"))

    monkeypatch.setattr(harness_compat, "DEFAULT_VENDORED_PATH",
                        "/nonexistent/lm_harness")
    monkeypatch.setattr(downstream, "lm_eval_available", lambda: False)

    params = init_llama_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    out = downstream.evaluation_downstream(
        params, CFG, str(model_dir), task_pack=pack_dir)
    assert out is not None and out["backend"] == "taskpack"
    assert 0.0 <= out["results"]["code_cloze"]["acc"] <= 1.0

    # no pack, no harness -> loud None
    assert downstream.evaluation_downstream(
        params, CFG, str(model_dir), task_pack=None) is None
