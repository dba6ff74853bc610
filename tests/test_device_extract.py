"""Device-side extraction (v2) vs the host oracle (VERDICT r2 item 3).

Uncapped extractions must be BIT-EQUAL to data/extract.py (same sorted
parent ids, same induced edge list in the same emission order, same local
centers). Capped extractions can't be bit-equal (different RNG streams) so
they are checked for the invariants the reference's cap guarantees:
exactly sample_nodes nodes kept, centers present, membership a subset of
the full h-hop set, and the induced edge list consistent with the kept set.
"""

import numpy as np
import pytest

from gmeta_tpu.data.device_extract import DeviceExtractor
from gmeta_tpu.data.extract import SubgraphExtractor
from gmeta_tpu.data.graph import CSRGraph, synthetic_store


def _random_graph(n=400, deg=6, seed=0):
    store, _ = synthetic_store(1, n, deg, 4, 3, seed)
    return store.graphs[0]


@pytest.mark.parametrize("h", [1, 2, 3])
def test_uncapped_bit_equal_to_oracle(h):
    g = _random_graph()
    oracle = SubgraphExtractor([g], h=h, sample_nodes=10**6, seed=0)
    dev = DeviceExtractor(g, h=h, sample_nodes=g.num_nodes,
                          set_cap=4096, hop_budget=16384,
                          edge_budget=16384, edge_out=8192)
    centers = np.arange(0, g.num_nodes, 17)
    subs = dev.extract_batch(centers)
    for c, sub in zip(centers, subs):
        ref = oracle.extract_node(0, int(c), f"0_{c}")
        np.testing.assert_array_equal(sub.parents, ref.parents)
        np.testing.assert_array_equal(sub.edge_src, ref.edge_src)
        np.testing.assert_array_equal(sub.edge_dst, ref.edge_dst)
        np.testing.assert_array_equal(sub.centers, ref.centers)


def test_link_union_bit_equal_to_oracle():
    g = _random_graph(n=300, deg=5, seed=1)
    oracle = SubgraphExtractor([g], h=2, sample_nodes=10**6, seed=0)
    dev = DeviceExtractor(g, h=2, sample_nodes=g.num_nodes, n_centers=2,
                          set_cap=2048, hop_budget=8192,
                          edge_budget=8192, edge_out=4096)
    pairs = np.array([[1, 7], [20, 33], [100, 5], [250, 251]])
    subs = dev.extract_batch(pairs)
    for (i, j), sub in zip(pairs, subs):
        ref = oracle.extract_link(0, int(i), int(j), f"0_{i}_{j}")
        np.testing.assert_array_equal(sub.parents, ref.parents)
        np.testing.assert_array_equal(sub.edge_src, ref.edge_src)
        np.testing.assert_array_equal(sub.edge_dst, ref.edge_dst)
        np.testing.assert_array_equal(sub.centers, ref.centers)


def test_capped_invariants():
    g = _random_graph(n=800, deg=12, seed=2)
    cap = 64
    dev = DeviceExtractor(g, h=2, sample_nodes=cap,
                          set_cap=2048, hop_budget=32768,
                          edge_budget=8192, edge_out=4096, seed=7)
    full = SubgraphExtractor([g], h=2, sample_nodes=10**6, seed=0)
    centers = np.array([0, 13, 200, 555])
    subs = dev.extract_batch(centers)
    for c, sub in zip(centers, subs):
        full_set = full.extract_node(0, int(c), f"0_{c}").parents
        assert len(full_set) > cap, "test graph must trigger the cap"
        assert sub.num_nodes == cap
        assert int(c) in sub.parents.tolist()          # center re-added
        assert np.isin(sub.parents, full_set).all()    # subset of h-hop set
        # induced edges consistent: every endpoint is a kept node and the
        # edge exists in the parent graph
        src_g = sub.parents[sub.edge_src]
        dst_g = sub.parents[sub.edge_dst]
        for s, d in zip(src_g[:50], dst_g[:50]):
            assert s in g.in_neighbors(int(d))
        assert (np.diff(sub.edge_dst) >= 0).all()      # dst-major order


def test_cap_is_uniform_over_noncenter_nodes():
    """Two different seeds produce different uniform subsets (sanity that
    the selection isn't degenerate/deterministic)."""
    g = _random_graph(n=800, deg=12, seed=3)
    a = DeviceExtractor(g, h=2, sample_nodes=48, set_cap=2048,
                        hop_budget=32768, edge_budget=8192, edge_out=4096,
                        seed=1).extract_batch(np.array([5]))[0]
    b = DeviceExtractor(g, h=2, sample_nodes=48, set_cap=2048,
                        hop_budget=32768, edge_budget=8192, edge_out=4096,
                        seed=2).extract_batch(np.array([5]))[0]
    assert not np.array_equal(a.parents, b.parents)


def test_overflow_flag_raises():
    g = _random_graph(n=400, deg=8, seed=4)
    # hop_budget far below the 2-hop in-degree sum -> overflow flagged
    dev = DeviceExtractor(g, h=2, sample_nodes=32, set_cap=64,
                          hop_budget=16, edge_budget=256, edge_out=128)
    with pytest.raises(OverflowError):
        dev.extract_batch(np.array([0]))
