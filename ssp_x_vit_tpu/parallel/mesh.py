"""Device mesh + sharding helpers (GSPMD/pjit over ICI).

The reference has no distributed machinery at all (SURVEY.md §2.7): its only
multi-GPU feature is accelerate layer-placement for 7B LLMs
(src/slicegpt_utils/gpu_utils.py:70-91). The TPU-native replacement is a
``jax.sharding.Mesh`` with named axes:

- ``data``  — batch data parallelism (calibration / eval / finetune batches)
- ``model`` — tensor parallelism for the LLM path (attention heads / FFN)

Single-chip runs use a trivial 1x1 mesh; the same code scales to a v5e-8 (or
multi-host) mesh transparently — XLA inserts the collectives implied by the
sharding constraints.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (data, model) mesh. ``data=None`` uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data*model} devices, have {n}")
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis, replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, batch):
    """Place a batch dict with its leading axis split over the data axis."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim)), batch
    )
