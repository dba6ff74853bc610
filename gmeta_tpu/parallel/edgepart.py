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

This is the simple all-gather variant (communication V*H per layer); a
boundary-only halo is a later optimization. Semantics match
models/gcn.py's GraphConv math exactly (clamp-norm, no self-loops).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

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


def make_full_graph_forward(layer_dims: Sequence[Tuple[int, int]],
                            mesh: Mesh, n_shards: int, Vb: int):
    """Returns jitted forward(params, h, shard_arrays) -> (D*Vb, H_out)
    node embeddings, h sharded over 'edge', params replicated. Math is
    GraphConv per models/gcn.py (clamp-norm before/after, ReLU)."""

    def local_layer(h_full, e_src, e_dst, e_mask, norm_local, w, b):
        # h_full: (D*Vb, Hin) gathered; aggregate into owned rows only.
        msgs = h_full[e_src] * e_mask[:, None]
        agg = jax.ops.segment_sum(msgs, e_dst, num_segments=Vb,
                                  indices_are_sorted=True)
        out = jnp.dot(agg, w, preferred_element_type=jnp.float32)
        out = out * norm_local + b
        return jax.nn.relu(out)

    def shard_fn(params, h_block, e_src, e_dst, e_mask, deg):
        # h_block: (Vb, H) this shard's rows; e_*: (Eb,) this shard's edges
        norm = jax.lax.rsqrt(jnp.maximum(deg, 1.0))[:, None]
        h = h_block
        for i, _ in enumerate(layer_dims):
            w, b = params[2 * i], params[2 * i + 1]
            h = h * norm
            # halo exchange: gather all shards' current blocks over ICI
            h_full = jax.lax.all_gather(h, "edge", tiled=True)
            h = local_layer(h_full, e_src, e_dst, e_mask, norm, w, b)
        return h

    from jax import shard_map
    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P("edge"), P("edge"), P("edge"), P("edge"), P("edge")),
        out_specs=P("edge"))
    return jax.jit(fn)


def full_graph_embed(params, feats: np.ndarray, g: CSRGraph, mesh: Mesh,
                     layer_dims) -> jnp.ndarray:
    """Convenience wrapper: shard, pad, run, unpad. Returns (V, H_out)."""
    D = mesh.shape["edge"]
    sg = shard_graph(g, D)
    h0 = pad_features(np.asarray(feats, np.float32), sg, D)
    fwd = make_full_graph_forward(layer_dims, mesh, D, sg.Vb)
    shd = NamedSharding(mesh, P("edge"))
    rep = NamedSharding(mesh, P())

    def put(a):
        return jax.device_put(jnp.asarray(np.reshape(a, (-1,) + a.shape[2:])),
                              shd)

    params = jax.device_put(tuple(jnp.asarray(p) for p in params), rep)
    out = fwd(params, jax.device_put(jnp.asarray(h0), shd),
              put(sg.edge_src), put(sg.edge_dst), put(sg.edge_mask),
              put(sg.deg))
    return out[:sg.num_nodes]
