"""Training-state checkpoint/resume via orbax (aux subsystem, SURVEY.md §5.4).

The reference has no training-state checkpointing (its only training is the
head finetune). TPU-native equivalent: orbax saves/restores
(params, opt_state, step) so long finetunes survive preemption — standard
production practice on TPU pods.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax


def save_train_state(ckpt_dir: str, step: int, params, opt_state) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": params, "opt_state": opt_state,
                      "step": jax.numpy.asarray(step)}, force=True)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_"):
            try:
                steps.append((int(name.split("_", 1)[1]), name))
            except ValueError:
                continue
    if not steps:
        return None
    return os.path.join(ckpt_dir, max(steps)[1])


def restore_train_state(path: str, params_like, opt_state_like) -> Tuple[Any, Any, int]:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    target = {"params": params_like, "opt_state": opt_state_like,
              "step": jax.numpy.asarray(0)}
    restored = ckptr.restore(os.path.abspath(path), target)
    return restored["params"], restored["opt_state"], int(restored["step"])
