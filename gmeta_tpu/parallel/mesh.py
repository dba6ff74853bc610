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


def init_multihost(coordinator_address: str = None,
                   num_processes: int = None,
                   process_id: int = None) -> int:
    """Multi-host bring-up: `jax.distributed.initialize` + a barrier, then
    mesh construction proceeds identically — `make_mesh` sees the global
    device list, so the same training code runs on a pod slice (SURVEY.md
    §2.4: the reference has NO distributed backend; this is its TPU-native
    equivalent). Args default to the TPU environment's auto-detection
    (GKE/Cloud TPU metadata); pass them explicitly elsewhere.

    Returns this process's index. Call once, before any jax array op.
    Layout guidance: keep the 'task' axis innermost over ICI so the
    meta-gradient psum rides ICI; DCN only crosses host boundaries.
    """
    import jax.distributed
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    # barrier: a tiny psum across all devices proves every host is up
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    devs = np.asarray(jax.devices())
    mesh = Mesh(devs, axis_names=("all",))
    one = shard_map(lambda x: jax.lax.psum(x, "all"), mesh=mesh,
                    in_specs=P(), out_specs=P())(jnp.ones(()))
    assert int(one) == len(devs)
    return jax.process_index()
