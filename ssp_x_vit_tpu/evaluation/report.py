"""JSON + Markdown run reports with the reference schema
(reference src/vit_pruning.py:877-946)."""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


def to_serializable(obj):
    try:
        json.dumps(obj)
        return obj
    except Exception:
        if isinstance(obj, (list, tuple)):
            return [to_serializable(x) for x in obj]
        if isinstance(obj, dict):
            return {str(k): to_serializable(v) for k, v in obj.items()}
        # numpy / jax scalars
        if hasattr(obj, "item"):
            try:
                return obj.item()
            except Exception:
                pass
        if hasattr(obj, "tolist"):
            try:
                return obj.tolist()
            except Exception:
                pass
        return str(obj)


def save_report(report: Dict[str, Any], out_dir: str, run_id: Optional[str] = None) -> Dict[str, str]:
    """Save JSON and Markdown consolidated report (same layout as the reference)."""
    os.makedirs(out_dir, exist_ok=True)
    if run_id is None:
        run_id = time.strftime("%Y%m%d-%H%M%S")
    json_path = os.path.join(out_dir, f"report-{run_id}.json")
    md_path = os.path.join(out_dir, f"report-{run_id}.md")

    with open(json_path, "w", encoding="utf-8") as f:
        json.dump(to_serializable(report), f, indent=2, ensure_ascii=False)

    lines = [f"# 2SSP ViT Pruning Report ({run_id})", ""]
    if "config" in report:
        lines.append("## Config")
        for k, v in report["config"].items():
            lines.append(f"- {k}: {v}")
        lines.append("")
    if "metrics" in report:
        m = report["metrics"]
        lines += [
            "## Parameters reduction",
            f"- Stage-1 (Width): {m.get('params_before_stage1_millions')}M -> "
            f"{m.get('params_after_stage1_millions')}M ({m.get('stage1_reduction_percent')}%)",
            f"- Stage-2 (Depth): {m.get('params_after_stage1_millions')}M -> "
            f"{m.get('params_after_stage2_millions')}M ({m.get('stage2_reduction_percent')}%)",
            f"- Final result: {m.get('params_before_stage1_millions')}M -> "
            f"{m.get('params_after_stage2_millions')}M ({m.get('total_reduction_percent')}%)",
            "",
            "## Latency",
            f"- Baseline: {m.get('latency_baseline_ms')} ms",
            f"- Stage-1 (Width): {m.get('latency_stage1_ms')} ms ({m.get('latency_stage1_change_percent')}%)",
            f"- Stage-2 (Depth): {m.get('latency_stage2_ms')} ms ({m.get('latency_stage2_change_percent')}%)",
            f"- Final change: {m.get('latency_total_change_percent')}%",
            "",
            "## Accuracy",
            f"- Baseline: {m.get('acc_baseline')}",
            f"- Stage-1 (Width): {m.get('acc_stage1')} (drop: {m.get('acc_drop_stage1_percent')}%)",
            f"- Stage-2 (Depth): {m.get('acc_stage2')} (drop: {m.get('acc_drop_stage2_percent')}%)",
            f"- Final change: {m.get('acc_total_drop_percent')}%",
            "",
        ]
    if "plan" in report:
        p = report["plan"]
        frac = p.get("stage2_fraction")
        frac_str = f"{frac:.4f}" if isinstance(frac, (int, float)) else str(frac)
        lines += [
            "## Auto-allocation plan",
            f"- Target sparsity: {p.get('target_sparsity')}",
            f"- Blocks total: {p.get('num_blocks_total')}",
            f"- Blocks to prune (Stage-2): {p.get('blocks_to_prune')} ({frac_str})",
            f"- Per-block neurons to prune (Stage-1): {p.get('per_block_neurons_to_prune')}",
            f"- Estimated total removed params: {p.get('estimated_total_removed_params')}",
            f"- Estimation error (params): {p.get('est_error_params')}",
            "",
        ]
    if "artifacts" in report:
        lines.append("## Artifacts")
        for k, v in report["artifacts"].items():
            lines.append(f"- {k}: {v}")
        lines.append("")

    with open(md_path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))

    return {"json": json_path, "md": md_path}
