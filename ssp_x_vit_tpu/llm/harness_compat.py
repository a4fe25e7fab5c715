"""Path-import of the vendored EleutherAI lm-evaluation-harness (read-only).

The reference vendors the full harness v0.4.7 at ``lm_harness/`` and drives it
via ``lm_eval.evaluator.simple_evaluate`` (reference src/evaluation.py:88-116).
We deliberately do not vendor 23 MB of harness code; instead, when ``lm_eval``
is not pip-installed, this module imports the reference's vendored copy from a
configurable path, stubbing the handful of optional pip dependencies that are
absent in this environment and unused by the loglikelihood/multiple-choice
code path (``evaluate``, ``sqlitedict``, ``jsonlines``, ...). The stubs raise
on actual use, so any code path that genuinely needs them fails loudly.
"""

from __future__ import annotations

import importlib
import os
import sys
import types

DEFAULT_VENDORED_PATH = os.environ.get(
    "SSP_X_VIT_LM_HARNESS_PATH", "/root/reference/lm_harness"
)


def _failing(name: str):
    def _raise(*a, **k):
        raise RuntimeError(
            f"optional dependency '{name}' is stubbed by harness_compat; "
            "this code path genuinely requires the real package"
        )

    return _raise


def _stub_module(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__dict__["__stub__"] = True
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


class _StubSqliteDict(dict):
    """Dict-backed SqliteDict stand-in (harness uses it only for request
    caching, which we never enable)."""

    def __init__(self, *a, **k):
        super().__init__()

    def commit(self):
        pass

    def close(self):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def _install_stubs() -> None:
    """Stub optional harness deps that are missing from this environment."""
    optional = {
        # registry.py falls back to hf-evaluate only for UNregistered metrics;
        # acc/acc_norm/exact_match etc. are all registered natively.
        "evaluate": {"load": _failing("evaluate.load")},
        # api/model.py imports SqliteDict at top level; used only by CachingLM.
        "sqlitedict": {"SqliteDict": _StubSqliteDict},
        "jsonlines": {"open": _failing("jsonlines.open")},
        "word2number": {},
        "pytablewriter": {
            "LatexTableWriter": _failing("pytablewriter"),
            "MarkdownTableWriter": _failing("pytablewriter"),
        },
    }
    for name, attrs in optional.items():
        try:
            importlib.import_module(name)
        except ImportError:
            _stub_module(name, **attrs)
    # word2number is imported as `from word2number import w2n`
    if getattr(sys.modules.get("word2number"), "__stub__", False):
        _stub_module("word2number.w2n", word_to_num=_failing("word2number"))


def ensure_lm_eval(vendored_path: str | None = None):
    """Import and return ``lm_eval``, preferring an installed package and
    falling back to the vendored copy at ``vendored_path`` (read-only)."""
    try:
        import lm_eval  # installed normally

        return lm_eval
    except ImportError:
        pass

    path = vendored_path or DEFAULT_VENDORED_PATH
    if not os.path.isdir(os.path.join(path, "lm_eval")):
        raise ImportError(
            f"Real lm-eval tasks (winogrande/arc/hellaswag/...) need the "
            f"EleutherAI harness, which is neither pip-installed nor found "
            f"at {path!r}. Fix one of: (1) pip install lm-eval; (2) set "
            f"SSP_X_VIT_LM_HARNESS_PATH to a checkout that contains an "
            f"lm_eval/ package (the reference vendors one at lm_harness/); "
            f"or (3) use the self-contained offline path instead: "
            f"ssp_x_vit_tpu.llm.taskpack / llm.zeroshot "
            f"(scripts/build_task_pack.py builds task packs with no "
            f"network or harness dependency)."
        )
    _install_stubs()
    if path not in sys.path:
        # Append (not prepend): the vendored tree must never shadow installed
        # packages of the same top-level names (e.g. `tests`).
        sys.path.append(path)
    import lm_eval

    return lm_eval
