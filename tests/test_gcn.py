"""GCN forward vs the numpy oracle of the reference's DGL/torch semantics
(SURVEY.md §4 unit tier; math at G-Meta/learner.py:25-54,134-194)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gmeta_tpu.config import Config, build_model_config
from gmeta_tpu.data.extract import SubgraphExtractor
from gmeta_tpu.data.graph import CSRGraph, GraphStore, synthetic_store
from gmeta_tpu.data.pack import pack_set, round_up
from gmeta_tpu.models.gcn import forward, init_params, precompute, count_params
from gmeta_tpu.ops.spmm import aggregate, densify, aggregate_dense

from oracle import gcn_forward


def _packed_case(seed=0, n_sub=5, link_pred=False):
    store, labels = synthetic_store(num_graphs=2, nodes_per_graph=60,
                                    avg_degree=6, feat_dim=8, seed=seed)
    ex = SubgraphExtractor(store.graphs, h=2, sample_nodes=10_000)
    rng = np.random.RandomState(seed)
    subs, gidx = [], []
    for k in range(n_sub):
        g = int(rng.randint(2))
        if link_pred:
            i, j = rng.choice(60, 2, replace=False)
            subs.append(ex.extract_link(g, int(i), int(j), f"{g}_{i}_{j}"))
        else:
            i = int(rng.randint(60))
            subs.append(ex.extract_node(g, i, f"{g}_{i}"))
        gidx.append(g)
    P = round_up(max(s.num_nodes for s in subs), 64)
    E = round_up(sum(s.num_edges for s in subs), 128)
    y = rng.randint(0, 3, size=n_sub)
    sg = pack_set(subs, gidx, y, store, P, E)
    return store, subs, gidx, sg


@pytest.mark.parametrize("link_pred", [False, True])
def test_forward_matches_oracle(link_pred):
    store, subs, gidx, sg = _packed_case(link_pred=link_pred)
    cfg = Config(h=2, hidden_dim=16, link_pred_mode=link_pred,
                 task_setup="Shared" if link_pred else "Disjoint")
    spec = build_model_config(cfg, store.feat_dim, 3)
    params = init_params(jax.random.PRNGKey(0), spec)
    got = np.asarray(forward(params, sg, jnp.asarray(store.features), spec))

    # Oracle: run each subgraph separately on raw edge lists.
    np_params = [np.asarray(p, np.float64) for p in params]
    want = []
    for sub, g in zip(subs, gidx):
        h0 = store.features[store.global_ids(g, sub.parents)].astype(np.float64)
        c = sub.centers if link_pred else sub.centers[:1]
        out = gcn_forward(h0, sub.edge_src, sub.edge_dst, sub.num_nodes,
                          np_params, c[None, :] if link_pred else c,
                          link_pred=link_pred)
        want.append(out[0])
    want = np.stack(want)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_matmul_order_switch_equivalent():
    """in>out projects first (learner.py:34-47); both orders must agree."""
    store, subs, gidx, sg = _packed_case(seed=3)
    feats = jnp.asarray(store.features)
    # hidden smaller than input -> project-first branch; widen -> agg-first.
    for hidden in (4, 32):
        cfg = Config(h=1, hidden_dim=hidden)
        spec = build_model_config(cfg, store.feat_dim, 3)
        params = init_params(jax.random.PRNGKey(1), spec)
        np_params = [np.asarray(p, np.float64) for p in params]
        got = np.asarray(forward(params, sg, feats, spec))
        want = np.stack([
            gcn_forward(store.features[store.global_ids(g, s.parents)].astype(np.float64),
                        s.edge_src, s.edge_dst, s.num_nodes, np_params,
                        s.centers[:1])[0]
            for s, g in zip(subs, gidx)])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_dense_equals_segment_sum():
    """The block-diagonal dense aggregation must equal the edge-list
    segment-sum oracle path on packed data (incl. padding)."""
    _, _, _, sg = _packed_case(seed=5)
    B, P = sg.node_gid.shape
    rng = np.random.RandomState(0)
    h = rng.randn(B * P, 8).astype(np.float32) \
        * np.asarray(sg.node_mask).reshape(-1)[:, None]
    A = densify(jnp.asarray(sg.edge_src), jnp.asarray(sg.edge_dst),
                jnp.asarray(sg.edge_mask), B, P)
    got = np.asarray(aggregate_dense(A, jnp.asarray(h).reshape(B, P, 8)))
    want = np.asarray(aggregate(jnp.asarray(h), jnp.asarray(sg.edge_src),
                                jnp.asarray(sg.edge_dst),
                                jnp.asarray(sg.edge_mask), B * P))
    np.testing.assert_allclose(got.reshape(B * P, 8), want, rtol=1e-5, atol=1e-5)


def test_param_counts_match_reference():
    """Model sizes printed by the reference at startup (BASELINE.md last row):
    arxiv 99,587 / Tissue 23,298 / Fold 82,563 / FirstMM 17,794 / ToL 67,330."""
    cases = [
        # (input_dim, hidden, labels, h, link_pred, expected); input dims
        # solved from the reference's printed counts (train.py:67 overwrites
        # the input_dim flag with the features' width).
        (128, 256, 3, 2, False, 99_587),     # arxiv: feat 128, Disjoint 3-way
        (50, 128, 2, 2, False, 23_298),      # tissue: feat 50, 2 classes
        (512, 128, 3, 2, False, 82_563),     # fold: feat 512, Disjoint 3-way
        (5, 128, 2, 2, True, 17_794),        # firstmm: feat 5, link-pred
        (1, 256, 2, 2, True, 67_330),        # tol: feat 1, link-pred
    ]
    for input_dim, hidden, labels, h, link_pred, expected in cases:
        cfg = Config(h=h, hidden_dim=hidden, link_pred_mode=link_pred,
                     task_setup="Shared" if link_pred else "Disjoint")
        spec = build_model_config(cfg, input_dim, labels)
        params = init_params(jax.random.PRNGKey(0), spec)
        assert count_params(params) == expected, (input_dim, hidden, labels)
