"""Static-shape packing of ragged subgraph batches.

The reference packs a task's subgraphs with `dgl.batch` into one ragged
block-diagonal graph (subgraph_data_processing.py:399-400) — the one idea
that cannot be translated to XLA, which needs static shapes. Here each task
set (support or query) is flat-packed: the S subgraphs' nodes occupy
consecutive slots of one (V,)-array and their edges one (E,)-array, padded
to bucketed sizes. Per-subgraph offsets live in `centers` precomputed on the
host, replacing the reference's runtime `cumsum(batch_num_nodes)` readout
offsets (learner.py:161-170).

Padding contract consumed by ops/spmm.py:
- pad nodes: gid 0, node_mask 0
- pad edges: src 0, dst V-1, edge_mask 0 (dst=V-1 keeps dst nondecreasing so
  segment_sum can use indices_are_sorted)
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence

import numpy as np

from gmeta_tpu.data.extract import Subgraph
from gmeta_tpu.data.graph import GraphStore


class SubgraphSet(NamedTuple):
    """One flat-packed set of S subgraphs (a task's support or query set).

    Leaves are numpy on the host, jax arrays on device; leading batch dims
    may be added by stacking/vmap.
    """
    node_gid: np.ndarray    # (V,) int32 global feature-table row (pad: 0)
    node_mask: np.ndarray   # (V,) float32 {0,1}
    edge_src: np.ndarray    # (E,) int32 flat-local (pad: 0)
    edge_dst: np.ndarray    # (E,) int32 flat-local, nondecreasing (pad: V-1)
    edge_mask: np.ndarray   # (E,) float32 {0,1}
    centers: np.ndarray     # (S, 2) int32 flat-local center slots (col 1 = col 0
                            #   for node tasks; second endpoint for link tasks)
    labels: np.ndarray      # (S,) int32


class TaskBatch(NamedTuple):
    spt: SubgraphSet
    qry: SubgraphSet


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def bucket_size(x: int, floor: int = 256) -> int:
    """Round up to {floor * 2^k} to bound the number of compiled shapes."""
    b = floor
    while b < x:
        b *= 2
    return b


def pack_set(subs: Sequence[Subgraph], graph_idxs: Sequence[int],
             labels: np.ndarray, store: GraphStore,
             V: int, E: int) -> SubgraphSet:
    S = len(subs)
    total_nodes = sum(s.num_nodes for s in subs)
    total_edges = sum(s.num_edges for s in subs)
    assert total_nodes <= V, (total_nodes, V)
    assert total_edges <= E, (total_edges, E)

    node_gid = np.zeros(V, dtype=np.int32)
    node_mask = np.zeros(V, dtype=np.float32)
    edge_src = np.zeros(E, dtype=np.int32)
    edge_dst = np.full(E, V - 1, dtype=np.int32)
    edge_mask = np.zeros(E, dtype=np.float32)
    centers = np.zeros((S, 2), dtype=np.int32)

    n_off = 0
    e_off = 0
    for k, (sub, g) in enumerate(zip(subs, graph_idxs)):
        n, e = sub.num_nodes, sub.num_edges
        node_gid[n_off:n_off + n] = store.global_ids(g, sub.parents)
        node_mask[n_off:n_off + n] = 1.0
        edge_src[e_off:e_off + e] = sub.edge_src + n_off
        edge_dst[e_off:e_off + e] = sub.edge_dst + n_off
        edge_mask[e_off:e_off + e] = 1.0
        c = sub.centers
        centers[k, 0] = c[0] + n_off
        centers[k, 1] = (c[1] if len(c) > 1 else c[0]) + n_off
        n_off += n
        e_off += e

    return SubgraphSet(node_gid=node_gid, node_mask=node_mask,
                       edge_src=edge_src, edge_dst=edge_dst,
                       edge_mask=edge_mask, centers=centers,
                       labels=np.asarray(labels, dtype=np.int32))


def pack_task(spt_subs, spt_graphs, spt_labels,
              qry_subs, qry_graphs, qry_labels,
              store: GraphStore, V_spt: int, E_spt: int,
              V_qry: int, E_qry: int) -> TaskBatch:
    return TaskBatch(
        spt=pack_set(spt_subs, spt_graphs, spt_labels, store, V_spt, E_spt),
        qry=pack_set(qry_subs, qry_graphs, qry_labels, store, V_qry, E_qry),
    )


def stack_tasks(tasks: List[TaskBatch]) -> TaskBatch:
    """Stack T same-shape tasks into arrays with a leading task axis."""
    import jax
    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *tasks)
