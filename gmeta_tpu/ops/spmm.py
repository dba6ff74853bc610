"""Sparse aggregation over flat-packed subgraph batches.

TPU-native replacement for DGL's C++ SpMM `update_all(copy_src, sum)`
(learner.py:38-45): out[v] = sum over edges (u -> v) of h[u]. Edges arrive
sorted by destination (pack.py contract), so the XLA path lowers to a sorted
segment-sum; a Pallas kernel (ops/pallas_spmm.py) covers the same contract.

Backward comes for free under jax.grad: d/dh of segment_sum is a gather
(the SpMM-transpose the reference gets from torch autograd, meta.py:125,149).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def in_degrees(edge_dst: jnp.ndarray, edge_mask: jnp.ndarray,
               num_nodes: int) -> jnp.ndarray:
    """Per-node in-degree of the packed batch — DGL `in_degrees()`
    (learner.py:29). Padding edges carry mask 0 and don't count."""
    return jax.ops.segment_sum(edge_mask, edge_dst, num_segments=num_nodes,
                               indices_are_sorted=True)


def aggregate(h: jnp.ndarray, edge_src: jnp.ndarray, edge_dst: jnp.ndarray,
              edge_mask: jnp.ndarray, num_nodes: int) -> jnp.ndarray:
    """out[v] = sum_{(u->v)} h[u]; no self-loop is added (the reference's
    GraphConv aggregates only over existing edges, learner.py:38-45)."""
    msgs = h[edge_src] * edge_mask[:, None]
    return jax.ops.segment_sum(msgs, edge_dst, num_segments=num_nodes,
                               indices_are_sorted=True)
