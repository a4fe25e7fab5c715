"""Device mesh + sharding helpers (GSPMD/pjit over ICI and DCN).

The reference has no distributed machinery at all (SURVEY.md §2.7): its only
multi-GPU feature is accelerate layer-placement for 7B LLMs
(src/slicegpt_utils/gpu_utils.py:70-91). The TPU-native replacement is a
``jax.sharding.Mesh`` with named axes:

- ``data``  — batch data parallelism (calibration / eval / finetune batches)
- ``model`` — tensor parallelism for the LLM path (attention heads / FFN)

Single-chip runs use a trivial 1x1 mesh; the same code scales to a v5e-8 or a
multi-host pod slice transparently (SURVEY.md §5.8) — XLA inserts the
collectives implied by the sharding constraints. ``make_mesh`` orders devices
topology-aware via ``mesh_utils.create_device_mesh`` so neighbouring mesh
coordinates are ICI neighbours; ``make_hybrid_mesh`` builds a (data, model)
mesh over an N-process DCN x per-host-ICI topology with the slow DCN hops
confined to the outermost stride of the data axis, so 'model' collectives
(and the inner data-parallel reductions) ride ICI only.
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
    """Create a (data, model) mesh. ``data=None`` uses all remaining devices.

    When the full device set is used, the grid comes from
    ``mesh_utils.create_device_mesh`` (ICI-topology-aware ordering on TPU,
    process-grouped on CPU); an explicit subset falls back to a plain
    reshape in the given order.
    """
    explicit = devices is not None
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data*model} devices, have {n}")
    if not explicit and data * model == n:
        try:
            from jax.experimental import mesh_utils

            grid = mesh_utils.create_device_mesh((data, model), devices=devices)
            return Mesh(grid, axis_names=("data", "model"))
        except Exception:
            pass  # unusual topologies: plain order below
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def make_hybrid_mesh(
    n_hosts: int,
    ici_data: int = 1,
    model: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """(data, model) mesh over an ``n_hosts``-process DCN x ICI topology.

    The data axis spans ``n_hosts * ici_data`` with the host (DCN) dimension
    as its OUTERMOST stride, and 'model' stays within a host — so tensor-
    parallel collectives always ride ICI, and data-parallel reductions
    hierarchically reduce over ICI first, DCN last (the GSPMD partitioner
    exploits the mesh-coordinate-to-process locality).

    Under a real multi-process runtime (``jax.process_count() > 1``) the grid
    comes from ``mesh_utils.create_hybrid_device_mesh`` honoring each
    process's local devices. Single-process runs (tests, the driver dryrun)
    SIMULATE the topology by grouping the flat device list into ``n_hosts``
    contiguous virtual hosts of ``ici_data * model`` devices each — same mesh
    shape, same sharding semantics, no real DCN required.
    """
    devices = list(devices if devices is not None else jax.devices())
    per_host = ici_data * model
    n = n_hosts * per_host
    if len(devices) < n:
        raise ValueError(
            f"hybrid mesh {n_hosts} hosts x ({ici_data}x{model}) needs {n} "
            f"devices, have {len(devices)}")
    devices = devices[:n]
    n_processes = len({d.process_index for d in devices})
    if n_processes > 1:
        if n_processes != n_hosts:
            raise ValueError(
                f"n_hosts={n_hosts} but devices span {n_processes} processes")
        from jax.experimental import mesh_utils

        # per-host ICI grid (ici_data, model) x DCN grid (n_hosts, 1)
        # -> (n_hosts * ici_data, model) with DCN outermost on axis 0.
        grid = mesh_utils.create_hybrid_device_mesh(
            (ici_data, model), (n_hosts, 1), devices=devices)
    else:
        grid = np.asarray(devices).reshape(n_hosts * ici_data, model)
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
