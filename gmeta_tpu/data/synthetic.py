"""In-memory synthetic datasets exercising all three task regimes, used by
tests and by bench.py (the reference datasets are external downloads,
README.md:183-186; the arxiv-like generator mirrors that recipe's scale)."""

from __future__ import annotations

from typing import Tuple

import numpy as np

from gmeta_tpu.data.extract import SubgraphExtractor
from gmeta_tpu.data.graph import GraphStore, synthetic_store
from gmeta_tpu.data.io import SplitIndex
from gmeta_tpu.data.pipeline import MetaDataset

# Fixed per-split sampler-seed offsets. (A string hash here would be
# PYTHONHASHSEED-salted, making the sampled episodes differ run to run.)
_MODE_SALT = {"train": 0, "val": 101, "test": 202}


def synthetic_disjoint(num_graphs=1, nodes_per_graph=3000, avg_degree=8,
                       feat_dim=32, num_classes=12, n_way=3, k_spt=3, k_qry=6,
                       batchsz=20, h=2, sample_nodes=1000, seed=0,
                       split=(0.6, 0.2, 0.2), class_signal=2.0,
                       homophily=0.0) -> Tuple[GraphStore, dict]:
    """Disjoint-label node classification: the *label space* is partitioned
    across splits (data_process/node_process.py:35-44 semantics).
    Returns (store, {mode: MetaDataset})."""
    store, labels = synthetic_store(num_graphs, nodes_per_graph, avg_degree,
                                    feat_dim, num_classes, seed, class_signal,
                                    homophily=homophily)
    rng = np.random.RandomState(seed)
    classes = rng.permutation(num_classes)
    n_tr = max(int(num_classes * split[0]), n_way)
    n_va = max(int(num_classes * split[1]), n_way)
    buckets = {"train": set(classes[:n_tr].tolist()),
               "val": set(classes[n_tr:n_tr + n_va].tolist()),
               "test": set(classes[n_tr + n_va:].tolist())}
    if len(buckets["test"]) < n_way:
        buckets["test"] = buckets["val"]

    rows = {m: [] for m in buckets}
    label_dict = {}
    for g in range(num_graphs):
        for n in range(nodes_per_graph):
            name = f"{g}_{n}"
            y = int(labels[g][n])
            label_dict[name] = y
            for m, cls_set in buckets.items():
                if y in cls_set:
                    rows[m].append((name, str(y)))

    extractor = SubgraphExtractor(store.graphs, h=h, sample_nodes=sample_nodes,
                                  seed=seed)
    datasets = {}
    for m in ("train", "val", "test"):
        datasets[m] = MetaDataset(
            store, extractor, SplitIndex(rows[m]), label_dict,
            task_setup="Disjoint", link_pred_mode=False,
            n_way=n_way, k_spt=k_spt, k_qry=k_qry,
            batchsz=batchsz if m == "train" else max(batchsz // 4, 4),
            seed=seed + _MODE_SALT[m])
    return store, datasets


def synthetic_shared(num_graphs=6, nodes_per_graph=800, avg_degree=8,
                     feat_dim=16, num_classes=4, k_spt=3, k_qry=5,
                     batchsz=12, h=2, sample_nodes=500, seed=0,
                     class_signal=2.0, homophily=0.0):
    """Shared-label node classification: the *graph space* is partitioned
    (node_process.py:82-99 semantics); every graph carries all classes."""
    store, labels = synthetic_store(num_graphs, nodes_per_graph, avg_degree,
                                    feat_dim, num_classes, seed, class_signal,
                                    homophily=homophily)
    rng = np.random.RandomState(seed)
    order = rng.permutation(num_graphs)
    n_tr = max(num_graphs * 3 // 5, 1)
    n_va = max((num_graphs - n_tr) // 2, 1)
    buckets = {"train": set(order[:n_tr].tolist()),
               "val": set(order[n_tr:n_tr + n_va].tolist()),
               "test": set(order[n_tr + n_va:].tolist()) or set(order[n_tr:n_tr + n_va].tolist())}

    rows = {m: [] for m in buckets}
    label_dict = {}
    for g in range(num_graphs):
        for n in range(nodes_per_graph):
            name = f"{g}_{n}"
            y = int(labels[g][n])
            label_dict[name] = y
            for m, g_set in buckets.items():
                if g in g_set:
                    rows[m].append((name, str(y)))

    extractor = SubgraphExtractor(store.graphs, h=h, sample_nodes=sample_nodes,
                                  seed=seed)
    datasets = {}
    for m in ("train", "val", "test"):
        datasets[m] = MetaDataset(
            store, extractor, SplitIndex(rows[m]), label_dict,
            task_setup="Shared", link_pred_mode=False,
            n_way=num_classes, k_spt=k_spt, k_qry=k_qry,
            batchsz=batchsz if m == "train" else max(batchsz // 4, 4),
            seed=seed + _MODE_SALT[m])
    return store, datasets


def synthetic_link_pred(num_graphs=6, nodes_per_graph=600, avg_degree=8,
                        feat_dim=16, k_spt=8, k_qry=8, batchsz=12,
                        sample_nodes=400, seed=0, spt_frac=0.3):
    """Shared link prediction: 30% of edges form the support (message-passing)
    graph, the rest the query pool, plus degree-proportional negatives —
    data_process/link_process.py:13,29-115 semantics. The message-passing
    graphs contain ONLY support-positive edges (README.md:196-199)."""
    rng = np.random.RandomState(seed)
    from gmeta_tpu.data.graph import CSRGraph

    graphs, feats = [], []
    rows = {"train": {"spt": [], "qry": [], "main": []},
            "val": {"spt": [], "qry": [], "main": []},
            "test": {"spt": [], "qry": [], "main": []}}
    label_dict = {}

    order = rng.permutation(num_graphs)
    n_tr = max(num_graphs * 3 // 5, 1)
    n_va = max((num_graphs - n_tr) // 2, 1)
    mode_of = {}
    for i, g in enumerate(order):
        mode_of[g] = ("train" if i < n_tr
                      else "val" if i < n_tr + n_va else "test")

    for g in range(num_graphs):
        n = nodes_per_graph
        m = n * avg_degree // 2
        src = rng.randint(0, n, size=m)
        dst = rng.randint(0, n, size=m)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        # dedupe undirected pairs
        lo, hi = np.minimum(src, dst), np.maximum(src, dst)
        pairs = np.unique(lo.astype(np.int64) * n + hi)
        lo, hi = pairs // n, pairs % n
        m = len(lo)
        perm = rng.permutation(m)
        n_spt = max(int(m * spt_frac), 1)
        spt_idx, qry_idx = perm[:n_spt], perm[n_spt:]

        # message-passing graph: support-positive edges only
        graphs.append(CSRGraph.from_edges(lo[spt_idx], hi[spt_idx], n,
                                          make_bidirectional=True))
        feats.append(rng.randn(n, feat_dim).astype(np.float32))

        mode = mode_of[g]
        existing = set(pairs.tolist())

        def neg_pairs(count):
            out = []
            while len(out) < count:
                a, b = rng.randint(0, n), rng.randint(0, n)
                if a == b:
                    continue
                key = min(a, b) * n + max(a, b)
                if key not in existing:
                    out.append((min(a, b), max(a, b)))
            return out

        for pool, idxs in (("spt", spt_idx), ("qry", qry_idx)):
            pos = [(int(lo[i]), int(hi[i])) for i in idxs]
            neg = neg_pairs(len(pos))
            for (a, b), y in [(p, 1) for p in pos] + [(p, 0) for p in neg]:
                name = f"{g}_{a}_{b}"
                label_dict[name] = y
                rows[mode][pool].append((name, str(y)))
                rows[mode]["main"].append((name, str(y)))

    store = GraphStore(graphs, feats)
    extractor = SubgraphExtractor(store.graphs, h=2, sample_nodes=sample_nodes,
                                  seed=seed)
    datasets = {}
    for mode in ("train", "val", "test"):
        datasets[mode] = MetaDataset(
            store, extractor, SplitIndex(rows[mode]["main"]), label_dict,
            task_setup="Shared", link_pred_mode=True,
            n_way=2, k_spt=k_spt, k_qry=k_qry,
            batchsz=batchsz if mode == "train" else max(batchsz // 4, 4),
            index_spt=SplitIndex(rows[mode]["spt"]),
            index_qry=SplitIndex(rows[mode]["qry"]),
            seed=seed + _MODE_SALT[mode])
    return store, datasets
