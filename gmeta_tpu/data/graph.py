"""Graph storage: in-edge CSR arrays + a globally packed feature table.

The reference keeps graphs as DGL C++ graph objects and queries them
per-node from Python (`G.in_edges(i)`, `G.subgraph(nodes)`,
subgraph_data_processing.py:300-319). Here each graph is two flat numpy
arrays (CSR over *in*-edges, matching the reference's in-neighbor frontier
semantics) so extraction is vectorized slicing, and all graphs' features are
packed into one table so the device can gather rows by global id inside jit
instead of the reference's host-side `np.vstack` gather (meta.py:119-120).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import numpy as np


@dataclasses.dataclass
class CSRGraph:
    """In-edge CSR: for node v, in_neighbors(v) = indices[indptr[v]:indptr[v+1]].

    `in_neighbors` mirrors DGL's `G.in_edges(v)[0]` (sources of edges into v),
    which is what both the frontier expansion (subgraph_data_processing.py:301)
    and the GCN aggregation+normalization (learner.py:29,38-45) consume.
    """

    indptr: np.ndarray   # (num_nodes + 1,) int64
    indices: np.ndarray  # (num_edges,) int32, sorted within each row

    def __post_init__(self):
        self.indptr = np.asarray(self.indptr, dtype=np.int64)
        self.indices = np.asarray(self.indices, dtype=np.int32)

    @property
    def num_nodes(self) -> int:
        return len(self.indptr) - 1

    @property
    def num_edges(self) -> int:
        return len(self.indices)

    def in_neighbors(self, v: int) -> np.ndarray:
        return self.indices[self.indptr[v]:self.indptr[v + 1]]

    def in_degrees(self, nodes=None) -> np.ndarray:
        d = np.diff(self.indptr)
        return d if nodes is None else d[nodes]

    @staticmethod
    def from_edges(src, dst, num_nodes: int, make_bidirectional: bool = False) -> "CSRGraph":
        """Build in-edge CSR from a directed edge list (src -> dst)."""
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        if make_bidirectional:
            src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
        # CSR keyed by dst: row v holds all srcs of edges (u -> v).
        order = np.lexsort((src, dst))
        src, dst = src[order], dst[order]
        indptr = np.zeros(num_nodes + 1, dtype=np.int64)
        np.add.at(indptr, dst + 1, 1)
        np.cumsum(indptr, out=indptr)
        return CSRGraph(indptr=indptr, indices=src.astype(np.int32))

    def in_neighbors_of(self, nodes: np.ndarray) -> np.ndarray:
        """Concatenated in-neighbor lists of `nodes` (with duplicates) — the
        vectorized form of the reference's per-node Python loop
        `[[G.in_edges(i)[0]] for i in f_hop]` (subgraph_data_processing.py:302).
        """
        nodes = np.asarray(nodes, dtype=np.int64)
        starts = self.indptr[nodes]
        counts = (self.indptr[nodes + 1] - starts).astype(np.int64)
        total = int(counts.sum())
        if total == 0:
            return np.zeros(0, dtype=np.int32)
        flat_idx = np.repeat(starts, counts) + (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(counts) - counts, counts)
        )
        return self.indices[flat_idx]

    def induced_edges(self, nodes_sorted: np.ndarray):
        """Edges of the induced subgraph on `nodes_sorted` (sorted unique parent
        ids), relabeled to local indices. Matches DGL `G.subgraph(nodes)`
        semantics (subgraph_data_processing.py:316) with nodes in sorted order.

        Returns (src_local, dst_local) int32 arrays of edges (u -> v), i.e.
        v's in-neighbors restricted to the node set.
        """
        nodes_sorted = np.asarray(nodes_sorted, dtype=np.int64)
        starts = self.indptr[nodes_sorted]
        ends = self.indptr[nodes_sorted + 1]
        counts = (ends - starts).astype(np.int64)
        total = int(counts.sum())
        if total == 0:
            e = np.zeros(0, dtype=np.int32)
            return e, e
        # Gather all in-neighbor lists of the selected nodes in one shot.
        flat_idx = np.repeat(starts, counts) + (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(counts) - counts, counts)
        )
        srcs = self.indices[flat_idx].astype(np.int64)
        dst_local = np.repeat(
            np.arange(len(nodes_sorted), dtype=np.int64), counts)
        # Keep only edges whose source is also in the node set.
        pos = np.searchsorted(nodes_sorted, srcs)
        pos = np.minimum(pos, len(nodes_sorted) - 1)
        keep = nodes_sorted[pos] == srcs
        return pos[keep].astype(np.int32), dst_local[keep].astype(np.int32)


class GraphStore:
    """A list of graphs plus one packed feature table.

    node global id = graph_offset[g] + local node id; features.shape = (sum
    of all graphs' nodes, F). Mirrors the on-disk contract of
    README.md:190-201 (graph list + per-graph feature matrices).
    """

    def __init__(self, graphs: Sequence[CSRGraph], features: Sequence[np.ndarray]):
        assert len(graphs) == len(features)
        for g, f in zip(graphs, features):
            assert g.num_nodes == f.shape[0], (g.num_nodes, f.shape)
        self.graphs: List[CSRGraph] = list(graphs)
        feat_dim = features[0].shape[1]
        for f in features:
            assert f.shape[1] == feat_dim
        self.node_offsets = np.zeros(len(graphs) + 1, dtype=np.int64)
        np.cumsum([g.num_nodes for g in graphs], out=self.node_offsets[1:])
        self.features = np.concatenate(
            [np.asarray(f, dtype=np.float32) for f in features], axis=0)

    @property
    def num_graphs(self) -> int:
        return len(self.graphs)

    @property
    def feat_dim(self) -> int:
        return self.features.shape[1]

    def global_ids(self, g_idx: int, local_ids: np.ndarray) -> np.ndarray:
        return (self.node_offsets[g_idx] + np.asarray(local_ids, dtype=np.int64))


def synthetic_store(
    num_graphs: int = 1,
    nodes_per_graph: int = 2000,
    avg_degree: int = 10,
    feat_dim: int = 32,
    num_classes: int = 10,
    seed: int = 0,
    class_signal: float = 1.0,
    homophily: float = 0.0,
):
    """Random multi-graph dataset with class-correlated features, for tests
    and benchmarks. Edges are made bidirectional (the reference datasets are
    effectively undirected: in/out degree comments at learner.py:135-136).

    `homophily` is the fraction of edges rewired to connect SAME-class
    endpoints. The GCN has no self-loops (learner.py:38-45), so a center's
    embedding sees only its neighbors' features — without homophily a node's
    own label is structurally invisible to the model (as in a uniform random
    graph) and meta-learning cannot beat chance. The reference's real
    datasets are homophilous citation/PPI graphs.

    Returns (GraphStore, labels) where labels[g] is (nodes_per_graph,) int.
    """
    rng = np.random.RandomState(seed)
    graphs, feats, labels = [], [], []
    for g in range(num_graphs):
        n = nodes_per_graph
        m = n * avg_degree // 2
        y = rng.randint(0, num_classes, size=n)
        src = rng.randint(0, n, size=m)
        dst = rng.randint(0, n, size=m)
        if homophily > 0.0:
            # rewire a fraction of edges to a same-class destination
            by_class = [np.flatnonzero(y == c) for c in range(num_classes)]
            rew = rng.rand(m) < homophily
            for e in np.flatnonzero(rew):
                pool = by_class[y[src[e]]]
                if len(pool):
                    dst[e] = pool[rng.randint(len(pool))]
        keep = src != dst
        graphs.append(CSRGraph.from_edges(src[keep], dst[keep], n,
                                          make_bidirectional=True))
        centers = rng.randn(num_classes, feat_dim).astype(np.float32)
        x = (centers[y] * class_signal
             + rng.randn(n, feat_dim).astype(np.float32))
        feats.append(x)
        labels.append(y)
    return GraphStore(graphs, feats), labels
