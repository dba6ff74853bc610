"""Sparse aggregation over packed subgraph batches.

TPU-native replacement for DGL's C++ SpMM `update_all(copy_src, sum)`
(learner.py:38-45): out[v] = sum over edges (u -> v) of h[u].

Two paths:

1. `densify` + `aggregate_dense` — the production path. The strided packing
   (pack.py) makes the batch adjacency block-diagonal with S blocks of
   <= P x P, so aggregation is a batched dense matmul (S,P,P)@(S,P,H) on the
   MXU. The adjacency is built ONCE per task by a scalar scatter of E edge
   weights (cheap), then every GCN layer / inner-loop step / backward pass
   is pure matmul — TPU scatter of E x H messages (what segment_sum lowers
   to) is orders of magnitude slower than the MXU at these sizes.
   Backward comes free: d/dh of A@h is A^T@g, another batched matmul.

2. `aggregate` — edge-list segment-sum, kept as the correctness oracle and
   as the fallback for shapes where densification is wasteful (P > ~2048).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# --- path 1: block-diagonal dense (production) ------------------------------

def densify(edge_src: jnp.ndarray, edge_dst: jnp.ndarray,
            edge_mask: jnp.ndarray, S: int, P: int,
            dtype=jnp.float32) -> jnp.ndarray:
    """(S, P, P) block-diagonal adjacency: A[s, v, u] = 1 for each edge
    (u -> v) inside subgraph s (flat slots s*P+u, s*P+v). Padding edges carry
    mask 0 and scatter nothing. Edges never cross subgraphs (extraction is
    per-subgraph), so src // P == dst // P for all real edges."""
    sid = edge_dst // P
    dst_l = edge_dst - sid * P
    src_l = edge_src - sid * P
    A = jnp.zeros((S, P, P), dtype=dtype)
    return A.at[sid, dst_l, src_l].add(edge_mask.astype(dtype))


def aggregate_dense(A: jnp.ndarray, h: jnp.ndarray,
                    preferred=jnp.float32) -> jnp.ndarray:
    """out[s,v] = sum_u A[s,v,u] * h[s,u] — batched MXU matmul.
    h: (S, P, H)."""
    return jax.lax.dot_general(
        A, h, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=preferred)


def degrees_from_dense(A: jnp.ndarray) -> jnp.ndarray:
    """(S, P) in-degrees — DGL `in_degrees()` (learner.py:29)."""
    return A.sum(axis=2)


# --- path 2: edge-list segment-sum (oracle / large-P fallback) --------------

def in_degrees(edge_dst: jnp.ndarray, edge_mask: jnp.ndarray,
               num_nodes: int) -> jnp.ndarray:
    """Per-node in-degree of the packed batch. Padding edges carry mask 0."""
    return jax.ops.segment_sum(edge_mask, edge_dst, num_segments=num_nodes,
                               indices_are_sorted=True)


def aggregate(h: jnp.ndarray, edge_src: jnp.ndarray, edge_dst: jnp.ndarray,
              edge_mask: jnp.ndarray, num_nodes: int) -> jnp.ndarray:
    """out[v] = sum_{(u->v)} h[u]; no self-loop is added (the reference's
    GraphConv aggregates only over existing edges, learner.py:38-45)."""
    msgs = h[edge_src] * edge_mask[:, None]
    return jax.ops.segment_sum(msgs, edge_dst, num_segments=num_nodes,
                               indices_are_sorted=True)
