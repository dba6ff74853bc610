import numpy as np

from gmeta_tpu.data.graph import CSRGraph, GraphStore, synthetic_store


def brute_in_neighbors(src, dst, v):
    return sorted(int(s) for s, d in zip(src, dst) if d == v)


def test_from_edges_in_neighbors():
    rng = np.random.RandomState(0)
    n, m = 30, 200
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    g = CSRGraph.from_edges(src, dst, n)
    assert g.num_nodes == n
    assert g.num_edges == m
    for v in range(n):
        assert sorted(g.in_neighbors(v).tolist()) == brute_in_neighbors(src, dst, v)
    # in_degrees
    deg = g.in_degrees()
    for v in range(n):
        assert deg[v] == len(brute_in_neighbors(src, dst, v))


def test_bidirectional():
    g = CSRGraph.from_edges([0, 1], [1, 2], 3, make_bidirectional=True)
    assert sorted(g.in_neighbors(1).tolist()) == [0, 2]
    assert g.in_neighbors(0).tolist() == [1]
    assert g.in_neighbors(2).tolist() == [1]


def test_in_neighbors_of_set():
    rng = np.random.RandomState(1)
    n, m = 40, 300
    src, dst = rng.randint(0, n, m), rng.randint(0, n, m)
    g = CSRGraph.from_edges(src, dst, n)
    nodes = np.array([3, 7, 7, 20])
    got = sorted(g.in_neighbors_of(nodes).tolist())
    want = sorted(sum((brute_in_neighbors(src, dst, v) for v in nodes), []))
    assert got == want


def test_induced_edges():
    rng = np.random.RandomState(2)
    n, m = 25, 150
    src, dst = rng.randint(0, n, m), rng.randint(0, n, m)
    g = CSRGraph.from_edges(src, dst, n)
    nodes = np.unique(rng.choice(n, 10, replace=False))
    s_loc, d_loc = g.induced_edges(nodes)
    got = sorted(zip(s_loc.tolist(), d_loc.tolist()))
    node_set = set(nodes.tolist())
    pos = {v: i for i, v in enumerate(nodes.tolist())}
    want = sorted((pos[int(s)], pos[int(d)]) for s, d in zip(src, dst)
                  if int(s) in node_set and int(d) in node_set)
    assert got == want
    # dst must be nondecreasing (pack.py contract for sorted segment_sum)
    assert (np.diff(d_loc) >= 0).all()


def test_graph_store_global_ids():
    store, _ = synthetic_store(num_graphs=3, nodes_per_graph=50, feat_dim=4)
    assert store.features.shape == (150, 4)
    gid = store.global_ids(1, np.array([0, 5]))
    assert gid.tolist() == [50, 55]
    np.testing.assert_array_equal(store.features[gid], store.features[50:56:5])
