"""Device mesh construction.

The reference has no distributed backend at all (SURVEY.md §2.4: no
NCCL/Gloo/MPI anywhere). Scale-out here is expressed through
`jax.sharding.Mesh` + sharding annotations; XLA emits the collectives over
ICI. Axes:
  - 'task': data-parallel over the meta-batch (the reference's sequential
    Python task loop, meta.py:118, becomes vmap within a chip x DP across
    chips; meta-gradient = psum over this axis)
  - 'edge': edge-partitioning of large graphs with halo exchange
    (parallel/edgepart.py)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(task: int = 0, edge: int = 1, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if task <= 0:
        task = len(devices) // max(edge, 1)
    assert task * edge <= len(devices), (task, edge, len(devices))
    grid = devices[: task * edge].reshape(task, edge)
    return Mesh(grid, axis_names=("task", "edge"))
