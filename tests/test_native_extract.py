"""Native C++ extraction engine vs the numpy oracle path."""

import numpy as np
import pytest

from gmeta_tpu.data import native
from gmeta_tpu.data.extract import SubgraphExtractor
from gmeta_tpu.data.graph import CSRGraph

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native engine not built")


def _graph(seed=0, n=300, m=2000):
    rng = np.random.RandomState(seed)
    src, dst = rng.randint(0, n, m), rng.randint(0, n, m)
    return CSRGraph.from_edges(src, dst, n)


def test_matches_numpy_oracle_uncapped():
    g = _graph()
    ref = SubgraphExtractor([g], h=2, sample_nodes=10_000)
    nat = native.NativeSubgraphExtractor([g], h=2, sample_nodes=10_000)
    for c in (0, 17, 123, 299):
        a = ref.extract_node(0, c, f"0_{c}")
        b = nat.extract(f"0_{c}")
        np.testing.assert_array_equal(a.parents, b.parents)
        np.testing.assert_array_equal(a.centers, b.centers)
        # same edge multiset (both dst-sorted; src order within a dst row
        # may differ)
        np.testing.assert_array_equal(a.edge_dst, b.edge_dst)
        got = sorted(zip(b.edge_src.tolist(), b.edge_dst.tolist()))
        want = sorted(zip(a.edge_src.tolist(), a.edge_dst.tolist()))
        assert got == want


def test_link_pred_union():
    g = _graph(seed=2)
    ref = SubgraphExtractor([g], h=3, sample_nodes=10_000)  # h ignored
    nat = native.NativeSubgraphExtractor([g], h=3, sample_nodes=10_000)
    a = ref.extract_link(0, 5, 40, "0_5_40")
    b = nat.extract("0_5_40")
    np.testing.assert_array_equal(a.parents, b.parents)
    np.testing.assert_array_equal(a.centers, b.centers)


def test_cap_and_center_readd():
    # star graph: center 0 has 200 in-neighbors
    src = np.arange(1, 201)
    dst = np.zeros(200, dtype=int)
    g = CSRGraph.from_edges(src, dst, 201)
    nat = native.NativeSubgraphExtractor([g], h=1, sample_nodes=20)
    sub = nat.extract("0_0")
    assert sub.num_nodes <= 21
    assert 0 in sub.parents.tolist()
    assert sub.parents[sub.centers[0]] == 0
    # deterministic per seed
    nat2 = native.NativeSubgraphExtractor([g], h=1, sample_nodes=20)
    np.testing.assert_array_equal(sub.parents, nat2.extract("0_0").parents)


def test_batch_threads_consistent():
    g = _graph(seed=3, n=500, m=4000)
    nat1 = native.NativeSubgraphExtractor([g], h=2, sample_nodes=64,
                                          n_threads=1)
    nat8 = native.NativeSubgraphExtractor([g], h=2, sample_nodes=64,
                                          n_threads=8)
    names = [f"0_{i}" for i in range(100)]
    a = nat1.extract_many(names)
    b = nat8.extract_many(names)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x.parents, y.parents)


def test_degree_cap_matches_numpy_exactly():
    """cap_strategy='degree' is deterministic (top-k by in-degree, ties by
    node id), so native and numpy must agree bitwise — unlike the uniform
    cap, whose RNGs differ by design."""
    g = _graph(seed=4, n=400, m=6000)
    ref = SubgraphExtractor([g], h=2, sample_nodes=32, cap_strategy="degree")
    nat = native.NativeSubgraphExtractor([g], h=2, sample_nodes=32,
                                         cap_strategy="degree")
    for c in (0, 3, 77, 399):
        a = ref.extract_node(0, c, f"0_{c}")
        b = nat.extract(f"0_{c}")
        np.testing.assert_array_equal(a.parents, b.parents)
        np.testing.assert_array_equal(a.centers, b.centers)
        np.testing.assert_array_equal(a.edge_dst, b.edge_dst)


def test_extraction_order_and_hashseed_invariant():
    """Capped extraction must be a pure function of (graphs, name, seed):
    identical whether names arrive batched, reversed, or one-by-one
    (the per-item RNG stream is content-derived, not batch-position-derived)."""
    g = _graph(seed=7, n=600, m=9000)
    names = [f"0_{i}" for i in (5, 99, 321, 17, 402)]
    a = native.NativeSubgraphExtractor([g], h=2, sample_nodes=48)
    subs_batched = a.extract_many(names)
    b = native.NativeSubgraphExtractor([g], h=2, sample_nodes=48)
    subs_rev = list(reversed(b.extract_many(list(reversed(names)))))
    c = native.NativeSubgraphExtractor([g], h=2, sample_nodes=48)
    subs_single = [c.extract(n) for n in names]
    for x, y, z in zip(subs_batched, subs_rev, subs_single):
        np.testing.assert_array_equal(x.parents, y.parents)
        np.testing.assert_array_equal(x.parents, z.parents)


def test_degree_cap_all_equal_degrees():
    """Adversarial tie-break case (VERDICT weak #6): every candidate has the
    SAME in-degree, so the cap cut is decided purely by the id tie-break —
    numpy's full lexsort and the C++ engine's nth_element partial sort must
    still pick the identical node set."""
    # ring of rings: every node has in-degree exactly 2 (bidirectional ring)
    n = 257  # prime-ish, avoids accidental structure
    src = np.concatenate([np.arange(n), (np.arange(n) + 1) % n])
    dst = np.concatenate([(np.arange(n) + 1) % n, np.arange(n)])
    g = CSRGraph.from_edges(src, dst, n)
    ref = SubgraphExtractor([g], h=3, sample_nodes=4, cap_strategy="degree")
    nat = native.NativeSubgraphExtractor([g], h=3, sample_nodes=4,
                                         cap_strategy="degree")
    for c in (0, 64, 128, 256):
        a = ref.extract_node(0, c, f"0_{c}")
        b = nat.extract(f"0_{c}")
        np.testing.assert_array_equal(a.parents, b.parents)
        np.testing.assert_array_equal(a.centers, b.centers)
        got = sorted(zip(b.edge_src.tolist(), b.edge_dst.tolist()))
        want = sorted(zip(a.edge_src.tolist(), a.edge_dst.tolist()))
        assert got == want


def test_disk_cache_roundtrip(tmp_path):
    """extract_cache round-trips bit-exactly and a warmed extractor's
    results equal a cold one's (native RNG is content-derived)."""
    import os
    import numpy as np
    from gmeta_tpu.data import extract_cache, native
    from gmeta_tpu.data.graph import synthetic_store
    if not native.available():
        import pytest
        pytest.skip("native engine not built")

    store, _ = synthetic_store(2, 300, 6, 8, 3, seed=7)
    ex = native.NativeSubgraphExtractor(store.graphs, h=2, sample_nodes=64,
                                        seed=1)
    names = [f"{g}_{i}" for g in range(2) for i in range(0, 300, 17)]
    ex.extract_many(names)
    path = str(tmp_path / "cache.npz")
    extract_cache.save(path, ex.cache)

    loaded = extract_cache.load(path)
    assert set(loaded) == set(ex.cache)
    for n in names:
        a, b = ex.cache[n], loaded[n]
        np.testing.assert_array_equal(a.parents, b.parents)
        np.testing.assert_array_equal(a.centers, b.centers)
        np.testing.assert_array_equal(a.edge_src, b.edge_src)
        np.testing.assert_array_equal(a.edge_dst, b.edge_dst)

    # a fresh extractor warmed with HALF the cache produces identical
    # results for the other half (order-invariance of the content RNG)
    ex2 = native.NativeSubgraphExtractor(store.graphs, h=2, sample_nodes=64,
                                         seed=1)
    half = {n: loaded[n] for n in names[: len(names) // 2]}
    ex2.cache.update(half)
    for n in names[len(names) // 2:]:
        got = ex2.extract(n)
        np.testing.assert_array_equal(got.parents, ex.cache[n].parents)
        np.testing.assert_array_equal(got.edge_src, ex.cache[n].edge_src)
