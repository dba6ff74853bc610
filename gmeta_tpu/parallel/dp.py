"""Task-axis data parallelism for the meta step.

Shards the meta-batch's leading task axis across the mesh's 'task' axis with
parameters replicated; under jit, XLA inserts the meta-gradient all-reduce
(psum over tasks). This is the TPU replacement for the reference's
sequential per-task Python loop (meta.py:118) — the main throughput lever
(SURVEY.md §2.3).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def task_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("task"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a TaskBatch (leading axis = tasks) sharded across 'task'."""
    sh = task_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def shard_train_step(train_step, mesh: Mesh):
    """jit a (params, opt_state, batch, feats) -> (params, opt_state, metrics)
    step with batch sharded over 'task', everything else replicated."""
    rep = replicated(mesh)
    sh = task_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(rep, rep, sh, rep),
        out_shardings=(rep, rep, rep),
    )
