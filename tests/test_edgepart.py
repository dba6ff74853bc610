"""Edge-partitioned full-graph GCN vs the single-device oracle on the
virtual 8-device CPU mesh (SURVEY.md §4 tier 4)."""

import numpy as np
import jax
import jax.numpy as jnp

from gmeta_tpu.data.graph import CSRGraph
from gmeta_tpu.parallel.edgepart import (full_graph_embed, shard_graph,
                                         pad_features)
from gmeta_tpu.parallel.mesh import make_mesh

from oracle import gcn_layer


def _graph(seed=0, n=500, m=3000):
    rng = np.random.RandomState(seed)
    src, dst = rng.randint(0, n, m), rng.randint(0, n, m)
    return src, dst, CSRGraph.from_edges(src, dst, n)


def test_shard_graph_partitions_all_edges():
    src, dst, g = _graph()
    sg = shard_graph(g, 4)
    assert int(sg.edge_mask.sum()) == g.num_edges
    # every real edge lands in the shard owning its destination
    for d in range(4):
        k = int(sg.edge_mask[d].sum())
        dsts = sg.edge_dst[d, :k] + d * sg.Vb
        assert dsts.min() >= d * sg.Vb and dsts.max() < (d + 1) * sg.Vb
    # degrees match
    deg_full = np.zeros(4 * sg.Vb)
    for d in range(4):
        deg_full[d * sg.Vb:(d + 1) * sg.Vb] = sg.deg[d]
    want = g.in_degrees()
    np.testing.assert_array_equal(deg_full[:g.num_nodes], want)


def test_full_graph_embed_matches_oracle():
    src, dst, g = _graph(seed=1)
    rng = np.random.RandomState(0)
    F, H1, H2 = 16, 24, 8
    feats = rng.randn(g.num_nodes, F).astype(np.float32)
    dims = [(F, H1), (H1, H2)]
    params = []
    for fi, fo in dims:
        params += [rng.randn(fi, fo).astype(np.float32) * 0.3,
                   rng.randn(fo).astype(np.float32) * 0.1]

    mesh = make_mesh(task=1, edge=8)
    got = np.asarray(full_graph_embed(params, feats, g, mesh, dims))

    h = feats.astype(np.float64)
    for i, _ in enumerate(dims):
        h = gcn_layer(h, src, dst, g.num_nodes,
                      np.asarray(params[2 * i], np.float64),
                      np.asarray(params[2 * i + 1], np.float64))
    np.testing.assert_allclose(got, h, rtol=5e-4, atol=5e-4)


def test_shard_count_invariance():
    """Same embeddings regardless of how many shards the edges split into."""
    src, dst, g = _graph(seed=2, n=257, m=1500)  # non-multiple of shards
    rng = np.random.RandomState(1)
    F, H = 8, 8
    feats = rng.randn(g.num_nodes, F).astype(np.float32)
    dims = [(F, H)]
    params = [rng.randn(F, H).astype(np.float32) * 0.3,
              np.zeros(H, np.float32)]
    out = {}
    for d in (2, 8):
        mesh = make_mesh(task=1, edge=d)
        out[d] = np.asarray(full_graph_embed(params, feats, g, mesh, dims))
    np.testing.assert_allclose(out[2], out[8], rtol=1e-5, atol=1e-6)


def test_boundary_halo_matches_all_gather():
    """halo='boundary' (all_to_all of static boundary sets) must equal the
    all_gather variant and the oracle, and ship strictly fewer rows."""
    from gmeta_tpu.parallel.edgepart import build_halo_plan
    src, dst, g = _graph(seed=4, n=400, m=2500)
    rng = np.random.RandomState(2)
    F, H1, H2 = 12, 16, 8
    feats = rng.randn(g.num_nodes, F).astype(np.float32)
    dims = [(F, H1), (H1, H2)]
    params = []
    for fi, fo in dims:
        params += [rng.randn(fi, fo).astype(np.float32) * 0.3,
                   rng.randn(fo).astype(np.float32) * 0.1]
    mesh = make_mesh(task=1, edge=4)
    a = np.asarray(full_graph_embed(params, feats, g, mesh, dims,
                                    halo="all_gather"))
    b = np.asarray(full_graph_embed(params, feats, g, mesh, dims,
                                    halo="boundary"))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    # the plan's real communicated rows never exceed what all_gather ships
    sg = shard_graph(g, 4)
    plan = build_halo_plan(sg, 4)
    assert plan.comm_rows <= 4 * 4 * sg.Vb
