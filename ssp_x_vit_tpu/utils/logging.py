"""Tagged logging helpers matching the reference's machine-parsed output
(adaptation-for-Pures-framework/auto_2ssp.py:65-69; [SUMMARY] contract in
manual-experiments/run_consensus_grid.py:189-200)."""

from __future__ import annotations

import json
from typing import Any, Dict


def step_log(msg: str) -> None:
    print(f"[STEP] {msg}", flush=True)


def stage_log(stage: str, msg: str) -> None:
    print(f"[stage:{stage}] {msg}", flush=True)


def summary_log(payload: Dict[str, Any]) -> None:
    """Machine-readable one-line summary parsed by the grid runners."""
    print(f"[SUMMARY] {json.dumps(payload)}", flush=True)
