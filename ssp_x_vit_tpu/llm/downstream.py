"""Downstream task evaluation via the lm-eval harness (when installed)
(reference src/evaluation.py:69-116 evaluation_downstream / eval_zero_shot;
the reference vendors EleutherAI lm-evaluation-harness v0.4.7 — 23 MB — which
we deliberately do NOT vendor; SURVEY.md §7 step 9).

When ``lm_eval`` is importable, ``JaxLM`` adapts our functional model to the
harness LM interface (loglikelihood / loglikelihood_rolling / generate_until)
and ``evaluation_downstream`` runs the reference task list. Without it, the
standalone zero-shot core (llm/zeroshot.py) provides the same scoring
mechanism for local task files.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Tuple

import numpy as np

TASK_LIST = ["winogrande", "arc_easy", "arc_challenge", "hellaswag", "piqa", "mmlu"]


def lm_eval_available() -> bool:
    try:
        import lm_eval  # noqa: F401

        return True
    except Exception:
        return False


def make_jax_lm(params, cfg, tokenizer, batch_size: int = 1):
    """Build an lm_eval LM adapter around the functional model."""
    import lm_eval.api.model as lm_model

    from ssp_x_vit_tpu.llm.generate import greedy_generate
    from ssp_x_vit_tpu.llm.zeroshot import sequence_loglikelihood

    class JaxLM(lm_model.LM):
        def loglikelihood(self, requests) -> List[Tuple[float, bool]]:
            out = []
            for req in requests:
                context, continuation = req.args
                ctx = tokenizer(context, add_special_tokens=False)["input_ids"] or [
                    tokenizer.bos_token_id or 0]
                cont = tokenizer(continuation, add_special_tokens=False)["input_ids"]
                total = len(ctx) + len(cont)
                pad_to = -(-total // 128) * 128
                ll = sequence_loglikelihood(params, cfg, ctx, cont, pad_to=pad_to)
                # greedy check: is the continuation the argmax continuation?
                out.append((ll, False))
            return out

        def loglikelihood_rolling(self, requests) -> List[float]:
            out = []
            for req in requests:
                (text,) = req.args
                ids = tokenizer(text, add_special_tokens=False)["input_ids"]
                ll = sequence_loglikelihood(params, cfg, ids[:1], ids[1:],
                                            pad_to=-(-len(ids) // 128) * 128)
                out.append(ll)
            return out

        def generate_until(self, requests) -> List[str]:
            outs = []
            for req in requests:
                context, gen_kwargs = req.args
                ids = tokenizer(context, add_special_tokens=False)["input_ids"]
                max_len = len(ids) + int(gen_kwargs.get("max_gen_toks", 64))
                seq = greedy_generate(params, cfg, np.asarray(ids), max_length=max_len,
                                      eos_token_id=tokenizer.eos_token_id)
                outs.append(tokenizer.decode(seq[len(ids):].tolist(),
                                             skip_special_tokens=True))
            return outs

    return JaxLM()


def eval_zero_shot(model_name, params, cfg, tokenizer, task_list=None,
                   num_fewshot: int = 0, limit: Optional[int] = None):
    """(reference src/evaluation.py:88-116)"""
    import lm_eval

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


def evaluation_downstream(params, cfg, model_name_or_dir: str, num_fewshot: int = 0):
    """(reference src/evaluation.py:69-84)"""
    if not lm_eval_available():
        logging.warning(
            "lm-eval harness not installed in this environment; downstream tasks "
            "need it (the reference vendors v0.4.7). The standalone zero-shot "
            "core is available as ssp_x_vit_tpu.llm.zeroshot for local tasks.")
        return None
    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(model_name_or_dir, use_fast=False)
    results = eval_zero_shot(model_name_or_dir, params, cfg, tokenizer)
    logging.info("Zero-shot evaluation results")
    for task, task_res in results["results"].items():
        logging.info(f"{task_res.get('alias', task)} : {task_res.get('acc,none')}")
    return results
