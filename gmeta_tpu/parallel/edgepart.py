"""Edge-partitioned full-graph GCN over the 'edge' mesh axis.

The reference never runs a GCN over a full graph — it only *extracts*
subgraphs from it in host python (subgraph_data_processing.py:300-319); a
full Tree-of-Life graph is still traversed serially. This module is the
rebuild's scale dimension (SURVEY.md §5.7, §2.3 "SP analog"): graphs whose
(V, H) activations exceed one chip's HBM are computed with

- nodes block-partitioned across the mesh's 'edge' axis (each shard owns
  rows [d*Vb, (d+1)*Vb)),
- edges partitioned by DESTINATION block, so every shard aggregates only
  into rows it owns (no scatter collisions across shards),
- one all_gather of the (Vb, H) feature blocks per GCN layer — the halo
  exchange, riding ICI — followed by purely local gather + segment-sum.

Two halo variants:

- `halo='all_gather'`: one all_gather of the (Vb, H) feature blocks per
  GCN layer — simple, communication V*H per layer regardless of structure.
- `halo='boundary'`: each shard sends only the rows other shards' edges
  actually reference (a static per-pair index plan built on the host), via
  one all_to_all per layer. Communication = sum of boundary-set sizes * H;
  on locality-partitioned graphs this is the ICI-bandwidth win that the
  ≥80% multi-host scaling-efficiency target rides on (BASELINE.json). On
  adversarially skewed graphs the plan's padded pair-width M approaches Vb
  and all_gather is the better choice — `HaloPlan.comm_rows` exposes the
  tradeoff so callers can pick.

Semantics match models/gcn.py's GraphConv math exactly (clamp-norm, no
self-loops).
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gmeta_tpu.data.graph import CSRGraph


class ShardedGraph(NamedTuple):
    """Static-shape edge shards. Shard d owns node rows
    [d*Vb, (d+1)*Vb) and all edges whose dst falls in that range."""
    edge_src: np.ndarray    # (D, Eb) int32 global src ids (pad: 0)
    edge_dst: np.ndarray    # (D, Eb) int32 LOCAL dst ids in [0, Vb) (pad: Vb-1)
    edge_mask: np.ndarray   # (D, Eb) float32
    deg: np.ndarray         # (D, Vb) float32 in-degrees of owned rows
    num_nodes: int          # true V (<= D * Vb)
    Vb: int


def shard_graph(g: CSRGraph, n_shards: int, pad_to: int = 128) -> ShardedGraph:
    """Partition a CSR graph's edges by destination block."""
    V = g.num_nodes
    Vb = -(-V // n_shards)
    Vb = ((Vb + pad_to - 1) // pad_to) * pad_to
    dst = np.repeat(np.arange(V, dtype=np.int64), np.diff(g.indptr))
    src = g.indices.astype(np.int64)
    owner = dst // Vb
    counts = np.bincount(owner, minlength=n_shards)
    Eb = ((int(counts.max()) + pad_to - 1) // pad_to) * pad_to

    e_src = np.zeros((n_shards, Eb), np.int32)
    e_dst = np.full((n_shards, Eb), Vb - 1, np.int32)
    e_mask = np.zeros((n_shards, Eb), np.float32)
    deg = np.zeros((n_shards, Vb), np.float32)
    for d in range(n_shards):
        sel = owner == d
        k = int(sel.sum())
        order = np.argsort(dst[sel], kind="stable")
        e_src[d, :k] = src[sel][order]
        e_dst[d, :k] = (dst[sel][order] - d * Vb)
        e_mask[d, :k] = 1.0
        np.add.at(deg[d], e_dst[d, :k], 1.0)
    return ShardedGraph(e_src, e_dst, e_mask, deg, V, Vb)


def pad_features(x: np.ndarray, sg: ShardedGraph, n_shards: int) -> np.ndarray:
    """(V, H) -> (D * Vb, H) zero-padded to the block partition."""
    out = np.zeros((n_shards * sg.Vb, x.shape[1]), x.dtype)
    out[:sg.num_nodes] = x
    return out


class HaloPlan(NamedTuple):
    """Static boundary-exchange plan for `halo='boundary'`.

    send_idx[p, d]: the (padded) LOCAL row indices shard p ships to shard d
    each layer; halo_src[d] remaps shard d's edge sources into the flattened
    (D * M, H) receive table (slot p*M+j = row j received from shard p).
    """
    send_idx: np.ndarray   # (D, D, M) int32 local rows p -> d (pad: 0)
    send_mask: np.ndarray  # (D, D, M) float32
    halo_src: np.ndarray   # (D, Eb) int32 into the receive table (pad: 0)
    M: int                 # padded per-pair boundary width

    @property
    def comm_rows(self) -> int:
        """Real rows shipped per layer (vs D * V for all_gather)."""
        return int(self.send_mask.sum())


def build_halo_plan(sg: ShardedGraph, n_shards: int,
                    pad_to: int = 8) -> HaloPlan:
    """Host-side: per (owner p, consumer d) boundary index sets + edge-source
    remap. Self-pairs (p == d) route through the same table so the kernel has
    one uniform gather."""
    D, Vb = n_shards, sg.Vb
    needs: List[List[np.ndarray]] = [[None] * D for _ in range(D)]
    for d in range(D):
        k = int(sg.edge_mask[d].sum())
        srcs = sg.edge_src[d, :k].astype(np.int64)
        owners = srcs // Vb
        for p in range(D):
            needs[p][d] = np.unique(srcs[owners == p]) - p * Vb
    M = max((len(needs[p][d]) for p in range(D) for d in range(D)),
            default=0)
    M = max(((M + pad_to - 1) // pad_to) * pad_to, pad_to)

    send_idx = np.zeros((D, D, M), np.int32)
    send_mask = np.zeros((D, D, M), np.float32)
    for p in range(D):
        for d in range(D):
            n = len(needs[p][d])
            send_idx[p, d, :n] = needs[p][d]
            send_mask[p, d, :n] = 1.0

    halo_src = np.zeros((D, sg.edge_src.shape[1]), np.int32)
    for d in range(D):
        k = int(sg.edge_mask[d].sum())
        srcs = sg.edge_src[d, :k].astype(np.int64)
        owners = srcs // Vb
        pos = np.empty(k, np.int64)
        for p in range(D):
            sel = owners == p
            # position of each needed row within p's (sorted-unique) send list
            pos[sel] = p * M + np.searchsorted(needs[p][d], srcs[sel] - p * Vb)
        halo_src[d, :k] = pos
    return HaloPlan(send_idx=send_idx, send_mask=send_mask,
                    halo_src=halo_src, M=M)


class OverlapPlan(NamedTuple):
    """Static plan for halo/compute OVERLAP (SURVEY.md §5.7): each shard's
    edges are split into LOCAL (source row owned by this shard — computable
    before any communication lands) and REMOTE (source arrives through the
    boundary all_to_all). The kernel issues the all_to_all first, aggregates
    local edges while it is in flight, then folds in the remote part — XLA's
    latency-hiding scheduler overlaps the collective with the local
    segment-sum because neither depends on the other.

    Shapes: local_* (D, L), remote_* (D, R); send_idx/send_mask (D, D, M)
    as in HaloPlan; remote_src indexes the flattened (D*M, H) receive table.
    """
    local_src: np.ndarray    # (D, L) int32 LOCAL row ids (pad: 0)
    local_dst: np.ndarray    # (D, L) int32 local dst, nondecreasing (pad: Vb-1)
    local_mask: np.ndarray   # (D, L) float32
    remote_src: np.ndarray   # (D, R) int32 into receive table (pad: 0)
    remote_dst: np.ndarray   # (D, R) int32 local dst, nondecreasing (pad: Vb-1)
    remote_mask: np.ndarray  # (D, R) float32
    send_idx: np.ndarray     # (D, D, M) int32 rows p ships to d (pad: 0)
    send_mask: np.ndarray    # (D, D, M) float32
    M: int

    @property
    def comm_rows(self) -> int:
        """Real boundary rows shipped per layer."""
        return int(self.send_mask.sum())

    @property
    def local_edges(self) -> int:
        return int(self.local_mask.sum())

    @property
    def remote_edges(self) -> int:
        return int(self.remote_mask.sum())


def build_overlap_plan(sg: ShardedGraph, n_shards: int,
                       pad_to: int = 8) -> OverlapPlan:
    """Host-side: split each shard's edge list by source ownership and build
    the boundary send plan (only p != d pairs ship rows; a shard's own rows
    never ride the interconnect)."""
    D, Vb = n_shards, sg.Vb
    needs: List[List[np.ndarray]] = [[np.zeros(0, np.int64)] * D
                                     for _ in range(D)]
    per_shard = []
    for d in range(D):
        k = int(sg.edge_mask[d].sum())
        srcs = sg.edge_src[d, :k].astype(np.int64)   # GLOBAL src ids
        dsts = sg.edge_dst[d, :k].astype(np.int64)   # already LOCAL dst ids
        owners = srcs // Vb
        loc = owners == d
        per_shard.append((srcs, dsts, owners, loc))
        for p in range(D):
            if p != d:
                needs[p][d] = np.unique(srcs[owners == p]) - p * Vb
    M = max((len(needs[p][d]) for p in range(D) for d in range(D)), default=0)
    M = max(((M + pad_to - 1) // pad_to) * pad_to, pad_to)
    L = max((int(loc.sum()) for _, _, _, loc in per_shard), default=0)
    R = max((int((~loc).sum()) for _, _, _, loc in per_shard), default=0)
    L = max(((L + pad_to - 1) // pad_to) * pad_to, pad_to)
    R = max(((R + pad_to - 1) // pad_to) * pad_to, pad_to)

    local_src = np.zeros((D, L), np.int32)
    local_dst = np.full((D, L), Vb - 1, np.int32)
    local_mask = np.zeros((D, L), np.float32)
    remote_src = np.zeros((D, R), np.int32)
    remote_dst = np.full((D, R), Vb - 1, np.int32)
    remote_mask = np.zeros((D, R), np.float32)
    send_idx = np.zeros((D, D, M), np.int32)
    send_mask = np.zeros((D, D, M), np.float32)
    for p in range(D):
        for d in range(D):
            n = len(needs[p][d])
            send_idx[p, d, :n] = needs[p][d]
            send_mask[p, d, :n] = 1.0
    for d in range(D):
        srcs, dsts, owners, loc = per_shard[d]
        nl = int(loc.sum())
        local_src[d, :nl] = srcs[loc] - d * Vb
        local_dst[d, :nl] = dsts[loc]
        local_mask[d, :nl] = 1.0
        rem = ~loc
        nr = int(rem.sum())
        pos = np.empty(nr, np.int64)
        r_src, r_own = srcs[rem], owners[rem]
        for p in range(D):
            sel = r_own == p
            pos[sel] = p * M + np.searchsorted(needs[p][d], r_src[sel] - p * Vb)
        remote_src[d, :nr] = pos
        remote_dst[d, :nr] = dsts[rem]
        remote_mask[d, :nr] = 1.0
    return OverlapPlan(local_src, local_dst, local_mask,
                       remote_src, remote_dst, remote_mask,
                       send_idx, send_mask, M)


def make_full_graph_forward(layer_dims: Sequence[Tuple[int, int]],
                            mesh: Mesh, n_shards: int, Vb: int,
                            halo: str = "all_gather", M: int = 0):
    """Returns jitted forward(params, h, *shard_arrays) -> (D*Vb, H_out)
    node embeddings, h sharded over 'edge', params replicated. Math is
    GraphConv per models/gcn.py (clamp-norm before/after, ReLU).

    halo='all_gather': shard arrays are (e_src GLOBAL, e_dst, e_mask, deg).
    halo='boundary':   shard arrays are (halo_src, e_dst, e_mask, deg,
    send_idx, send_mask) from a HaloPlan; one all_to_all of (D, M, H)
    boundary rows per layer instead of gathering all V rows."""
    assert halo in ("all_gather", "boundary"), halo

    def aggregate_into_owned(table, e_src, e_dst, e_mask, norm, w, b):
        msgs = table[e_src] * e_mask[:, None]
        agg = jax.ops.segment_sum(msgs, e_dst, num_segments=Vb,
                                  indices_are_sorted=True)
        out = jnp.dot(agg, w, preferred_element_type=jnp.float32)
        out = out * norm + b
        return jax.nn.relu(out)

    def shard_fn_all_gather(params, h_block, e_src, e_dst, e_mask, deg):
        # h_block: (Vb, H) this shard's rows; e_*: (Eb,) this shard's edges
        norm = jax.lax.rsqrt(jnp.maximum(deg, 1.0))[:, None]
        h = h_block
        for i, _ in enumerate(layer_dims):
            w, b = params[2 * i], params[2 * i + 1]
            h = h * norm
            # halo exchange: gather all shards' current blocks over ICI
            h_full = jax.lax.all_gather(h, "edge", tiled=True)
            h = aggregate_into_owned(h_full, e_src, e_dst, e_mask, norm, w, b)
        return h

    def shard_fn_boundary(params, h_block, halo_src, e_dst, e_mask, deg,
                          send_idx, send_mask):
        # send_idx/send_mask: (D, M) MY rows for each consumer shard;
        # halo_src: (Eb,) into the (D*M,) receive table.
        norm = jax.lax.rsqrt(jnp.maximum(deg, 1.0))[:, None]
        h = h_block
        for i, _ in enumerate(layer_dims):
            w, b = params[2 * i], params[2 * i + 1]
            h = h * norm
            send = h[send_idx] * send_mask[..., None]        # (D, M, H)
            recv = jax.lax.all_to_all(send, "edge", split_axis=0,
                                      concat_axis=0, tiled=False)
            table = recv.reshape(n_shards * M, -1)
            h = aggregate_into_owned(table, halo_src, e_dst, e_mask,
                                     norm, w, b)
        return h

    from jax import shard_map
    if halo == "all_gather":
        fn = shard_map(
            shard_fn_all_gather, mesh=mesh,
            in_specs=(P(),) + (P("edge"),) * 5, out_specs=P("edge"))
    else:
        assert M > 0, "boundary halo needs the HaloPlan's M"
        fn = shard_map(
            shard_fn_boundary, mesh=mesh,
            in_specs=(P(),) + (P("edge"),) * 7, out_specs=P("edge"))
    return jax.jit(fn)


def full_graph_embed(params, feats: np.ndarray, g: CSRGraph, mesh: Mesh,
                     layer_dims, halo: str = "all_gather") -> jnp.ndarray:
    """Convenience wrapper: shard, pad, run, unpad. Returns (V, H_out)."""
    D = mesh.shape["edge"]
    sg = shard_graph(g, D)
    h0 = pad_features(np.asarray(feats, np.float32), sg, D)
    shd = NamedSharding(mesh, P("edge"))
    rep = NamedSharding(mesh, P())

    def put(a):
        return jax.device_put(jnp.asarray(np.reshape(a, (-1,) + a.shape[2:])),
                              shd)

    params = jax.device_put(tuple(jnp.asarray(p) for p in params), rep)
    h0 = jax.device_put(jnp.asarray(h0), shd)
    if halo == "boundary":
        plan = build_halo_plan(sg, D)
        fwd = make_full_graph_forward(layer_dims, mesh, D, sg.Vb,
                                      halo="boundary", M=plan.M)
        out = fwd(params, h0, put(plan.halo_src), put(sg.edge_dst),
                  put(sg.edge_mask), put(sg.deg),
                  put(plan.send_idx), put(plan.send_mask))
    else:
        fwd = make_full_graph_forward(layer_dims, mesh, D, sg.Vb)
        out = fwd(params, h0, put(sg.edge_src), put(sg.edge_dst),
                  put(sg.edge_mask), put(sg.deg))
    return out[:sg.num_nodes]
