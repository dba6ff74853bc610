"""bench.py's parity-geometry replay (VERDICT r4 weak 3): the synthesized
pool must reproduce the run of record's compiled bucket shapes exactly and
hold packing-contract-valid content, so the bench number bounds production
from above instead of measuring unrelated shapes."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _fake_parity_record():
    return {
        "buckets": {"P_spt": 256, "B_spt": 3, "E_spt": 4096,
                    "P_qry": 256, "B_qry": 5, "E_qry": 8192},
        "mean_bin_fill": 0.6,
        "agg": "dense",
        "tasks_per_s": 100.0,
        "edges_per_s": 500_000.0,
    }


def test_pool_replays_recorded_buckets(monkeypatch):
    monkeypatch.setattr(bench, "POOL", 3)
    s = bench.SHAPES["fold_ppi"]
    rec = _fake_parity_record()
    feats, pool, mean_edges, agg = bench._pool_from_parity("fold_ppi", s, rec)
    b = rec["buckets"]
    assert agg == "dense"
    assert mean_edges == 5000.0
    assert feats.shape[1] == bench.REPLICA_META["fold_ppi"]["feat"]
    assert pool.spt.node_gid.shape == (3, b["B_spt"], b["P_spt"])
    assert pool.qry.node_gid.shape == (3, b["B_qry"], b["P_qry"])
    assert pool.spt.edge_src.shape == (3, b["E_spt"])
    assert pool.qry.edge_dst.shape == (3, b["E_qry"])
    # S = n_way * k per the preset episode structure
    assert pool.spt.centers.shape == (3, s["n_way"] * s["k_spt"], 2)
    assert pool.qry.centers.shape == (3, s["n_way"] * s["k_qry"], 2)


def test_pool_content_respects_packing_contract(monkeypatch):
    monkeypatch.setattr(bench, "POOL", 2)
    s = bench.SHAPES["tree_of_life"]
    rec = _fake_parity_record()
    feats, pool, _, _ = bench._pool_from_parity("tree_of_life", s, rec)
    for st in (pool.spt, pool.qry):
        B, P = st.node_gid.shape[-2:]
        for t in range(2):
            live = st.edge_mask[t] > 0
            src, dst = st.edge_src[t][live], st.edge_dst[t][live]
            # intra-bin edges (densify derives the bin from dst // P)
            np.testing.assert_array_equal(src // P, dst // P)
            # dst nondecreasing (segment_sum oracle contract)
            assert (np.diff(st.edge_dst[t]) >= 0).sum() >= 0  # sorted slice
            assert (np.diff(dst) >= 0).all()
            # edges and centers land on live (masked-1) slots
            flat_mask = st.node_mask[t].reshape(-1)
            assert flat_mask[src].all() and flat_mask[dst].all()
            c = st.centers[t].reshape(-1)
            assert flat_mask[c].all()
            # pad edges carry the pad contract (src 0, dst B*P-1)
            pad_dst = st.edge_dst[t][~live]
            assert (pad_dst == B * P - 1).all()
            # link task: second endpoint differs for at least one center
        assert (st.centers[..., 0] != st.centers[..., 1]).any()


def test_fallback_when_no_parity_record():
    assert bench._load_parity("no_such_recipe") is None
