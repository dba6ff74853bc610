"""Device-side h-hop subgraph extraction (v2): batched frontier expansion
under jit over CSR-in-HBM.

The reference extracts subgraphs by serial host traversal — per-node Python
``G.in_edges`` loops with set union (subgraph_data_processing.py:294-346).
The rebuild's host paths (data/extract.py numpy oracle, native/extract.cpp
C++ engine) keep those semantics with better constants; THIS module moves
extraction onto the TPU itself (SURVEY.md §3.3 closing note): a batch of C
centers is expanded simultaneously with nothing but fixed-shape gathers,
sorts and segment arithmetic, so the whole thing jits and runs from HBM.

Per center (vmapped over the batch):

1. frontier expansion, h rounds: members is a fixed-width sorted id array
   (pad = V). Each round gathers the concatenated in-neighbor lists of all
   current members through one segmented gather (cumsum + searchsorted over
   a flat edge budget), then unions them in via sort-based dedup — the
   fixed-shape replacement for the reference's Python set union. Matches
   {i} ∪ N(i) ∪ ... ∪ N^h(i) exactly (the reference keeps every ring,
   subgraph_data_processing.py:300-311).
2. node cap: if the set exceeds `sample_nodes`, keep a uniform random
   subset with the center(s) force-included (reference :312-314 samples
   uniformly THEN re-adds centers; sizes agree at sample_nodes, membership
   is the same uniform-without-replacement law, RNG streams differ — exact
   bit parity with numpy's RandomState is neither possible nor required,
   SURVEY.md §7 "RNG parity").
3. induced edges: one more segmented gather of the selected nodes' CSR
   rows, membership test by binary search into the sorted parent list,
   fixed-shape compaction (stable argsort on the keep mask). Emission order
   is identical to the host oracle's (dst-major, CSR order within a row),
   so uncapped extractions are BIT-EQUAL to data/extract.py.

Link-prediction tasks need the union of both endpoints' 2-hop
neighborhoods (reference :323-346): seeding the member set with both
centers and running 2 rounds produces exactly that union.

All shapes are static; overflow of any budget (full-set width, gather
budget, edge budget) is returned as a per-center flag so callers can route
those rare centers to the host path instead of silently truncating.

STATUS — correctness oracle, NOT the production extractor. Measured on the
real chip (BENCH_r03/r04 "extraction"): this path does ~6 extractions/s vs
~1,160/s for the threaded C++ engine (native/extract.cpp) that
data/pipeline.py actually uses. The gap is structural, not a tuning
problem: extraction is pointer-chasing — each frontier round is a data-
dependent gather over a ~32k-wide candidate set followed by a sort-based
dedup, and TPU row gathers sustain ~36 GB/s effective (measured in
scripts/bench_edges.py) against a host L2-resident traversal, while the
MXU, the only fast unit, has nothing to multiply. Batching more centers
per call amortizes dispatch but not the per-round sort volume, which
scales with C * width and stays VPU/HBM-bound — closing a 200x gap to
within 2x of the C++ engine is not reachable on this workload class. Kept
because (a) it proves h-hop semantics under jit BIT-EQUAL to the host
oracle (tests/test_device_extract.py), and (b) it is the building block
for a future fully-resident pipeline where subgraphs never touch the host
(edge-partitioned training, parallel/edgepart_train.py, is the path that
actually removes host extraction at scale).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gmeta_tpu.data.extract import Subgraph
from gmeta_tpu.data.graph import CSRGraph


class DeviceSubgraphs(NamedTuple):
    """One extracted batch, device-resident. Pad node id = V (sentinel)."""
    parents: jnp.ndarray        # (C, P) int32 sorted global ids (pad: V)
    n_nodes: jnp.ndarray        # (C,)
    centers_local: jnp.ndarray  # (C, n_c) int32 local index of each center
    edge_src: jnp.ndarray       # (C, E_out) int32 local (pad: 0)
    edge_dst: jnp.ndarray       # (C, E_out) int32 local, nondecreasing
    edge_mask: jnp.ndarray      # (C, E_out) float32
    n_edges: jnp.ndarray        # (C,)
    overflow: jnp.ndarray       # (C,) bool — any budget exceeded


def _segmented_gather(indptr, indices, nodes, node_valid, budget, V):
    """Concatenated in-neighbor lists of `nodes`, flattened into a fixed
    `budget`-wide window. Returns (cand ids (budget,), owner slot (budget,),
    valid (budget,), total real entries)."""
    starts = indptr[nodes]
    degs = jnp.where(node_valid, indptr[nodes + 1] - starts, 0)
    cum = jnp.cumsum(degs)
    total = cum[-1]
    j = jnp.arange(budget, dtype=jnp.int32)
    owner = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
    owner_c = jnp.minimum(owner, nodes.shape[0] - 1)
    prev = jnp.where(owner_c > 0, cum[owner_c - 1], 0)
    pos = starts[owner_c] + (j - prev)
    valid = j < jnp.minimum(total, budget)
    cand = jnp.where(valid, indices[pos], V)
    return cand, owner_c, valid, total


def _union_sorted(members, cand, width, V):
    """Sort-based dedup union of two padded id arrays -> (sorted padded
    array of `width`, true count). Pad id V sorts to the tail."""
    s = jnp.sort(jnp.concatenate([members, cand]))
    fresh = jnp.concatenate([jnp.array([True]), s[1:] != s[:-1]]) & (s < V)
    count = fresh.sum()
    order = jnp.argsort(~fresh, stable=True)  # fresh first, sorted order kept
    out = jnp.where(jnp.arange(s.shape[0]) < count, s[order], V)
    return out[:width], count


def make_device_extractor(g: CSRGraph, h: int, sample_nodes: int, *,
                          n_centers: int = 1, set_cap: int = 1 << 15,
                          hop_budget: int = 1 << 17,
                          edge_budget: int = 1 << 16,
                          edge_out: int = 1 << 14):
    """Build (jitted_fn, device_graph_arrays) for one CSR graph.

    jitted_fn(indptr, indices, centers (C, n_centers), key) ->
    DeviceSubgraphs with P = sample_nodes + n_centers node slots.
    """
    V = g.num_nodes
    P = sample_nodes + n_centers
    assert set_cap >= P, (
        f"set_cap ({set_cap}) must hold at least sample_nodes + n_centers "
        f"({P}) ids — it bounds the FULL pre-cap h-hop set")
    indptr_d = jnp.asarray(g.indptr, dtype=jnp.int32)
    indices_d = jnp.asarray(g.indices, dtype=jnp.int32)

    def one(indptr, indices, centers, key):
        members = jnp.full((set_cap,), V, jnp.int32)
        members = members.at[:n_centers].set(jnp.sort(centers))
        count = jnp.int32(n_centers)
        over = jnp.bool_(False)

        for _ in range(h):
            cand, _, _, total = _segmented_gather(
                indptr, indices, members, members < V, hop_budget, V)
            over |= total > hop_budget
            members, count = _union_sorted(members, cand, set_cap, V)
            over |= count > set_cap

        # cap: uniform scores, +2 bonus pins the centers into the kept set
        scores = jnp.where(members < V,
                           jax.random.uniform(key, (set_cap,)), -jnp.inf)
        pos_c = jnp.searchsorted(members, centers).astype(jnp.int32)
        scores = scores.at[pos_c].add(2.0)
        keep_n = jnp.minimum(count, sample_nodes)
        keep_n = jnp.maximum(keep_n, n_centers)
        _, sel = jax.lax.top_k(scores, P)
        ids = jnp.where(jnp.arange(P) < keep_n, members[sel], V)
        parents = jnp.sort(ids)
        centers_local = jnp.searchsorted(parents, centers).astype(jnp.int32)

        # induced edges: gather selected rows, keep edges whose src is also
        # selected; dst slot = row owner (parents are sorted, so dst is
        # nondecreasing — the same emission order as the host oracle)
        cand, owner, valid_e, total = _segmented_gather(
            indptr, indices, parents, parents < V, edge_budget, V)
        over |= total > edge_budget
        src_pos = jnp.searchsorted(parents, cand).astype(jnp.int32)
        src_pos = jnp.minimum(src_pos, P - 1)
        keep = valid_e & (parents[src_pos] == cand)
        n_edges = keep.sum()
        over |= n_edges > edge_out
        order = jnp.argsort(~keep, stable=True)[:edge_out]
        e_valid = jnp.arange(edge_out) < jnp.minimum(n_edges, edge_out)
        e_src = jnp.where(e_valid, src_pos[order], 0)
        e_dst = jnp.where(e_valid, owner[order], P - 1)
        return DeviceSubgraphs(
            parents=parents, n_nodes=keep_n.astype(jnp.int32),
            centers_local=centers_local,
            edge_src=e_src.astype(jnp.int32),
            edge_dst=e_dst.astype(jnp.int32),
            edge_mask=e_valid.astype(jnp.float32),
            n_edges=n_edges.astype(jnp.int32), overflow=over)

    @functools.partial(jax.jit, static_argnums=())
    def batch_fn(indptr, indices, centers, key):
        keys = jax.random.split(key, centers.shape[0])
        return jax.vmap(one, in_axes=(None, None, 0, 0))(
            indptr, indices, centers, keys)

    return batch_fn, (indptr_d, indices_d)


class DeviceExtractor:
    """Host-facing wrapper with the same output type as the host paths.

    `extract_arrays` keeps results on device (the production path — feeds
    packing/training without a host round-trip); `extract_batch`
    materializes host `Subgraph`s for oracle comparison.
    """

    def __init__(self, g: CSRGraph, h: int, sample_nodes: int, *,
                 n_centers: int = 1, seed: int = 0, **budgets):
        self.V = g.num_nodes
        self.h = h
        self.n_centers = n_centers
        self.sample_nodes = sample_nodes
        self.fn, self.graph_arrays = make_device_extractor(
            g, h, sample_nodes, n_centers=n_centers, **budgets)
        self.key = jax.random.PRNGKey(seed)

    def extract_arrays(self, centers: np.ndarray) -> DeviceSubgraphs:
        centers = np.asarray(centers, dtype=np.int32).reshape(
            -1, self.n_centers)
        self.key, sub = jax.random.split(self.key)
        return self.fn(*self.graph_arrays, jnp.asarray(centers), sub)

    def extract_batch(self, centers: np.ndarray) -> List[Subgraph]:
        out = jax.tree.map(np.asarray, self.extract_arrays(centers))
        if out.overflow.any():
            raise OverflowError(
                f"{int(out.overflow.sum())} centers exceeded a static "
                "budget; raise set_cap/hop_budget/edge_budget or route "
                "these centers to the host extractor")
        subs = []
        for c in range(out.parents.shape[0]):
            n, e = int(out.n_nodes[c]), int(out.n_edges[c])
            subs.append(Subgraph(
                parents=out.parents[c, :n].astype(np.int64),
                centers=out.centers_local[c],
                edge_src=out.edge_src[c, :e],
                edge_dst=out.edge_dst[c, :e]))
        return subs
