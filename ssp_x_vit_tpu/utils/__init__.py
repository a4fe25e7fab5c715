from ssp_x_vit_tpu.utils.seeding import set_seed
from ssp_x_vit_tpu.utils.logging import step_log, stage_log

__all__ = ["set_seed", "step_log", "stage_log"]
