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


# --- path 3: ELLPACK gather (full-graph / edge-partitioned aggregation) -----
#
# segment_sum lowers to TPU scatter-add, which serializes on colliding rows.
# ELL reformulates SpMM as a pure GATHER + masked reduction: each destination
# row v owns a fixed-width slab of neighbor slots. out[v] = sum_k
# h[nbr[v, k]] * mask[v, k]. No scatter, no collisions; the gather reads
# whole H-row vectors (contiguous), which the TPU DMA engine handles well.
# Width is row_cap per slab; rows with more in-edges spill into OVERFLOW
# slabs chained at the end (rare under power-law degree skew with a sane
# row_cap), so HBM cost stays ~E*H instead of V*max_degree*H.
#
# Measured (TPU v5e-1, scripts/bench_edges.py, V=512k E=4.2M H=128,
# power-law in-degrees): segment_sum ~71M edges/s fwd; ELL ~39M — the
# power-law tail costs ELL 2.5x slot waste, and XLA's row gather throughput
# (~36 GB/s effective vs ~800 GB/s HBM) bounds BOTH paths; a per-edge-row
# Pallas DMA would be descriptor-issue-rate-bound (worse). segment_sum is
# therefore the default local aggregation for edge-partitioned graphs
# (parallel/edgepart.py); ELL wins only when degrees are bounded
# (slot/edge ratio -> 1) so it stays available as an option.

def build_ell(edge_src: np.ndarray, edge_dst: np.ndarray, num_nodes: int,
              row_cap: int = 16, pad_to: int = 8):
    """Host-side: CSR edge list (sorted by dst) -> ELL slabs.

    Returns (nbr, mask, row_id) where nbr: (R, row_cap) int32 gather indices
    into the feature table (pad: 0), mask: (R, row_cap) float32, row_id: (R,)
    int32 destination row of each slab. R >= num_nodes; slab r accumulates
    into row_id[r] (rows with > row_cap in-edges own several slabs).
    Aggregation = segment_sum over at most ceil(max_deg/row_cap) colliding
    slabs — vs max_deg colliding edges for the plain edge-list path.
    """
    import numpy as _np
    edge_src = _np.asarray(edge_src, dtype=_np.int64)
    edge_dst = _np.asarray(edge_dst, dtype=_np.int64)
    deg = _np.bincount(edge_dst, minlength=num_nodes)
    slabs_per_row = _np.maximum(1, -(-deg // row_cap))
    R = int(slabs_per_row.sum())
    R_pad = ((R + pad_to - 1) // pad_to) * pad_to

    nbr = _np.zeros((R_pad, row_cap), _np.int32)
    mask = _np.zeros((R_pad, row_cap), _np.float32)
    row_id = _np.zeros(R_pad, _np.int32)
    slab_start = _np.zeros(num_nodes + 1, _np.int64)
    _np.cumsum(slabs_per_row, out=slab_start[1:])

    # slab of edge e = slab_start[dst] + rank_within_dst // row_cap
    order = _np.argsort(edge_dst, kind="stable")
    src_s, dst_s = edge_src[order], edge_dst[order]
    csr_start = _np.zeros(num_nodes + 1, _np.int64)
    _np.cumsum(deg, out=csr_start[1:])
    rank = _np.arange(len(dst_s)) - csr_start[dst_s]
    slab = slab_start[dst_s] + rank // row_cap
    col = rank % row_cap
    nbr[slab, col] = src_s
    mask[slab, col] = 1.0
    # row ids for every slab (incl. empty rows' single slab)
    rep = _np.repeat(_np.arange(num_nodes, dtype=_np.int32), slabs_per_row)
    row_id[:R] = rep
    row_id[R:] = num_nodes - 1 if num_nodes else 0  # pad slabs: mask all-zero
    return nbr, mask, row_id


def aggregate_ell(h: jnp.ndarray, nbr: jnp.ndarray, mask: jnp.ndarray,
                  row_id: jnp.ndarray, num_nodes: int) -> jnp.ndarray:
    """out[row_id[r]] += sum_k h[nbr[r, k]] * mask[r, k]. Gather-dominated;
    the only scatter is the slab->row segment_sum with <= ceil(max_deg /
    row_cap) collisions per row (row_id is nondecreasing)."""
    slab_sum = jnp.einsum("rkh,rk->rh", h[nbr], mask,
                          preferred_element_type=h.dtype)
    return jax.ops.segment_sum(slab_sum, row_id, num_segments=num_nodes,
                               indices_are_sorted=True)


# --- SDDMM + weighted SpMM (the DGL autograd kernel triple) ------------------
#
# The reference's GCN uses unweighted copy_src/sum aggregation, so its
# backward only ever needs SpMM^T (d/dh). A *weighted* SpMM — DGL's
# u_mul_e/sum — additionally needs SDDMM for d/dw: the sampled dense-dense
# product grad_out[dst_e] . h[src_e] evaluated only at existing edges
# (SURVEY.md §2.2 row 2). Provided here so weighted-graph models are a
# drop-in; the custom_vjp shows the full triple wired together.

def sddmm(g_out: jnp.ndarray, h: jnp.ndarray, edge_src: jnp.ndarray,
          edge_dst: jnp.ndarray, edge_mask: jnp.ndarray) -> jnp.ndarray:
    """values[e] = <g_out[dst_e], h[src_e]> for each edge, masked."""
    return (g_out[edge_dst] * h[edge_src]).sum(-1) * edge_mask


@jax.custom_vjp
def aggregate_weighted(h, w, edge_src, edge_dst, edge_mask, out_rows):
    """out[v] = sum_{(u->v)} w_e * h[u]. out_rows is a zeros template of the
    output shape (static row count under jit)."""
    msgs = h[edge_src] * (w * edge_mask)[:, None]
    return out_rows + jax.ops.segment_sum(
        msgs, edge_dst, num_segments=out_rows.shape[0],
        indices_are_sorted=True)


def _agg_w_fwd(h, w, edge_src, edge_dst, edge_mask, out_rows):
    out = aggregate_weighted(h, w, edge_src, edge_dst, edge_mask, out_rows)
    return out, (h, w, edge_src, edge_dst, edge_mask)


def _agg_w_bwd(res, g):
    h, w, edge_src, edge_dst, edge_mask = res
    # d/dh = SpMM^T: scatter g back along reversed edges
    dh = jax.ops.segment_sum((w * edge_mask)[:, None] * g[edge_dst],
                             edge_src, num_segments=h.shape[0])
    # d/dw = SDDMM at the existing edges
    dw = sddmm(g, h, edge_src, edge_dst, edge_mask)
    return dh, dw, None, None, None, jnp.zeros_like(g)


aggregate_weighted.defvjp(_agg_w_fwd, _agg_w_bwd)
