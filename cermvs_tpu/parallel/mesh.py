"""Device-mesh construction and sharding helpers.

The reference's only parallelism is single-process ``nn.DataParallel``
(``/root/reference/train.py:54``) plus SLURM job fan-out
(``scripts/submit_depthmap.py``).  The TPU-native replacement is one global
``jax.sharding.Mesh`` with named axes:

  * ``data`` — batch sharding for training (gradient all-reduce over ICI),
  * ``view`` — neighbor-view sharding for inference cost volumes
    (cross-view mean aggregation becomes a ``psum`` over this axis).

Multi-host: call :func:`initialize_distributed` first; the mesh then spans
all processes' devices and pjit inserts DCN collectives where needed.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: Optional[str] = None, **kwargs) -> None:
    """Multi-host init (replaces the reference's nonexistent multi-node path)."""
    if jax.process_count() == 1 and coordinator is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator, **kwargs)


def make_mesh(n_data: Optional[int] = None, n_view: int = 1, devices=None) -> Mesh:
    """Create a (data, view) mesh over the available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if n_data is None:
        n_data = n // n_view
    if n_data * n_view != n:
        raise ValueError(f"mesh {n_data}x{n_view} != {n} devices")
    return Mesh(devices.reshape(n_data, n_view), axis_names=("data", "view"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: int = 0) -> NamedSharding:
    spec = [None] * (axis + 1)
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def view_sharded(mesh: Mesh, axis: int = 0) -> NamedSharding:
    spec = [None] * (axis + 1)
    spec[axis] = "view"
    return NamedSharding(mesh, P(*spec))
