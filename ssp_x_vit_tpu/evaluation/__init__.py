from ssp_x_vit_tpu.evaluation.classify import evaluate_top1, evaluate_top1_candidates
from ssp_x_vit_tpu.evaluation.latency import measure_latency
from ssp_x_vit_tpu.evaluation.report import save_report

__all__ = [
    "evaluate_top1",
    "evaluate_top1_candidates",
    "measure_latency",
    "save_report",
]
