"""Importance-score interface layer
(reference pruning_srp-main/mask_conjunction.py:32-96, 236-362).

``PruningInterface.fit()`` contract (shapes as in the reference spec):
- DEPTH  att/mlp importance: array [n_blocks]
- WIDTH  att importance: per block [qk_rows], [vp_rows] pairs;
         mlp importance: per block [d_int]
- HEAD   att importance: per block [n_heads]
Lower importance = prune earlier. Interrelated weight groups:
DEPTH: [q,k,v,proj], [fc1,fc2]; WIDTH: [q,k], [v,proj], [fc1,fc2]; HEAD: [q,k],[v,proj].

``Auto2SSPInterface`` adapts 2SSP to this contract for our JAX ViT:
- att importance (DEPTH): vmapped skip-gate top-1 impact ("copy" mode — no
  deepcopies) or position heuristic; error_policy "raise"/"heuristic".
- mlp importance (WIDTH): fused activation-L2 side-output, weight-L1 fallback.
"""

from __future__ import annotations

import enum
from typing import List, Tuple

import numpy as np

from ssp_x_vit_tpu.models.vit import Params, ViTConfig
from ssp_x_vit_tpu.pruning.width import (
    compute_ffn_activation_importance,
    weight_l1_importance,
)
from ssp_x_vit_tpu.pruning.depth import (
    copy_replace_attention_importance,
    heuristic_attention_importance,
)


class PruningTypes(enum.Enum):
    DEPTH = 0
    WIDTH = 1
    HEAD = 2   # valid only for attention
    NONE = 3   # pruning this structure is unsupported


class PruningInterface:
    """Base contract; subclasses set prune types and implement fit()."""

    def __init__(self, params: Params, cfg: ViTConfig, pruning_batches=None):
        self.params = params
        self.cfg = cfg
        self.batches = pruning_batches
        self.att_prune_type = PruningTypes.DEPTH
        self.mlp_prune_type = PruningTypes.WIDTH
        self.att_importance = None
        self.mlp_importance = None

    def fit(self) -> Tuple[object, object]:
        raise NotImplementedError


class Auto2SSPInterface(PruningInterface):
    def __init__(
        self,
        params: Params,
        cfg: ViTConfig,
        pruning_batches=None,
        *,
        importance_mode: str = "copy",
        batch_limit: int = 5,
        min_remaining: int = 256,
        error_policy: str = "raise",
    ):
        super().__init__(params, cfg, pruning_batches)
        self.att_prune_type = PruningTypes.DEPTH
        self.mlp_prune_type = PruningTypes.WIDTH
        self.importance_mode = importance_mode
        self.batch_limit = batch_limit
        self.min_remaining = min_remaining
        self.error_policy = error_policy

    def _compute_mlp_importance(self) -> List[np.ndarray]:
        if self.batches is not None:
            try:
                imp = compute_ffn_activation_importance(
                    self.params, self.cfg, self.batches, batch_limit=self.batch_limit
                )
                return [imp[i] for i in range(self.cfg.num_layers)]
            except Exception:
                if self.error_policy == "raise":
                    raise
        imp = weight_l1_importance(self.params)
        return [imp[i] for i in range(self.cfg.num_layers)]

    def _compute_att_depth_importance(self) -> np.ndarray:
        L = self.cfg.num_layers
        if self.importance_mode.lower() == "heuristic" or self.batches is None:
            return heuristic_attention_importance(L)
        try:
            impacts, _ = copy_replace_attention_importance(
                self.params, self.cfg, self.batches,
                batch_limit=self.batch_limit, verbose=False,
            )
            return impacts
        except Exception:
            if self.error_policy == "raise":
                raise
            return heuristic_attention_importance(L)

    def fit(self):
        self.att_importance = self._compute_att_depth_importance()
        self.mlp_importance = self._compute_mlp_importance()
        return self.att_importance, self.mlp_importance
