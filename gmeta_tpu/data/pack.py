"""Static-shape packing of ragged subgraph batches.

The reference packs a task's subgraphs with `dgl.batch` into one ragged
block-diagonal graph (subgraph_data_processing.py:399-400) — the one idea
that cannot be translated to XLA, which needs static shapes. Here each task
set (support or query) is packed with a FIXED PER-SUBGRAPH STRIDE: subgraph
k's nodes occupy slots [k*P, k*P + n_k) of a (S*P,)-array, with P a bucketed
bound on subgraph size (the reference's own `sample_nodes` cap,
subgraph_data_processing.py:312-314, guarantees P <= ~sample_nodes).

The strided layout is what makes aggregation MXU-shaped: the packed graph's
adjacency is block-diagonal with S blocks of at most P x P, so message
passing becomes a batched dense matmul (S,P,P)@(S,P,H) — see models/gcn.py.
TPU scatter (segment_sum over edges) is orders of magnitude slower than the
MXU at these sizes; the edge lists below are densified into A ONCE per task
(a scalar scatter outside the inner loop), not per GCN layer.

Padding contract:
- pad nodes: gid 0, node_mask 0
- pad edges: src 0, dst V-1, edge_mask 0 (dst=V-1 keeps dst nondecreasing so
  the segment_sum oracle path can use indices_are_sorted)
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence

import numpy as np

from gmeta_tpu.data.extract import Subgraph
from gmeta_tpu.data.graph import GraphStore


class SubgraphSet(NamedTuple):
    """One packed set of S subgraphs (a task's support or query set).

    Nodes of subgraph k live at flat slots [k*P, k*P + n_k). Leaves are numpy
    on the host, jax arrays on device; leading batch dims may be added by
    stacking/vmap. S and P are recoverable as centers.shape[0] and
    node_gid.shape[0] // centers.shape[0].
    """
    node_gid: np.ndarray    # (S*P,) int32 global feature-table row (pad: 0)
    node_mask: np.ndarray   # (S*P,) float32 {0,1}
    edge_src: np.ndarray    # (E,) int32 flat-local (pad: 0)
    edge_dst: np.ndarray    # (E,) int32 flat-local, nondecreasing (pad: S*P-1)
    edge_mask: np.ndarray   # (E,) float32 {0,1}
    centers: np.ndarray     # (S, 2) int32 flat-local center slots (col 1 = col 0
                            #   for node tasks; second endpoint for link tasks)
    labels: np.ndarray      # (S,) int32

    @property
    def num_subgraphs(self) -> int:
        return self.centers.shape[-2]

    @property
    def stride(self) -> int:
        return self.node_gid.shape[-1] // self.centers.shape[-2]


class TaskBatch(NamedTuple):
    spt: SubgraphSet
    qry: SubgraphSet


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def bucket_size(x: int, floor: int = 128) -> int:
    """Round up to {floor * 2^k} to bound the number of compiled shapes."""
    b = floor
    while b < x:
        b *= 2
    return b


def pack_set(subs: Sequence[Subgraph], graph_idxs: Sequence[int],
             labels: np.ndarray, store: GraphStore,
             P: int, E: int) -> SubgraphSet:
    """Pack S subgraphs with per-subgraph node stride P and edge budget E."""
    S = len(subs)
    V = S * P
    max_nodes = max(s.num_nodes for s in subs)
    total_edges = sum(s.num_edges for s in subs)
    assert max_nodes <= P, (max_nodes, P)
    assert total_edges <= E, (total_edges, E)

    node_gid = np.zeros(V, dtype=np.int32)
    node_mask = np.zeros(V, dtype=np.float32)
    edge_src = np.zeros(E, dtype=np.int32)
    edge_dst = np.full(E, V - 1, dtype=np.int32)
    edge_mask = np.zeros(E, dtype=np.float32)
    centers = np.zeros((S, 2), dtype=np.int32)

    e_off = 0
    for k, (sub, g) in enumerate(zip(subs, graph_idxs)):
        n, e = sub.num_nodes, sub.num_edges
        n_off = k * P
        node_gid[n_off:n_off + n] = store.global_ids(g, sub.parents)
        node_mask[n_off:n_off + n] = 1.0
        edge_src[e_off:e_off + e] = sub.edge_src + n_off
        edge_dst[e_off:e_off + e] = sub.edge_dst + n_off
        edge_mask[e_off:e_off + e] = 1.0
        c = sub.centers
        centers[k, 0] = c[0] + n_off
        centers[k, 1] = (c[1] if len(c) > 1 else c[0]) + n_off
        e_off += e

    return SubgraphSet(node_gid=node_gid, node_mask=node_mask,
                       edge_src=edge_src, edge_dst=edge_dst,
                       edge_mask=edge_mask, centers=centers,
                       labels=np.asarray(labels, dtype=np.int32))


def pack_task(spt_subs, spt_graphs, spt_labels,
              qry_subs, qry_graphs, qry_labels,
              store: GraphStore, P_spt: int, E_spt: int,
              P_qry: int, E_qry: int) -> TaskBatch:
    return TaskBatch(
        spt=pack_set(spt_subs, spt_graphs, spt_labels, store, P_spt, E_spt),
        qry=pack_set(qry_subs, qry_graphs, qry_labels, store, P_qry, E_qry),
    )


def stack_tasks(tasks: List[TaskBatch]) -> TaskBatch:
    """Stack T same-shape tasks into arrays with a leading task axis."""
    import jax
    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *tasks)
