"""Real-data readiness: the reference-download path graph_dgl.pkl ->
convert_dgl_pickle -> graphs.npz -> training, end-to-end (VERDICT round 4
item 8; data contract at G-Meta/README.md:188-203).

dgl itself is absent here, so the pickle holds tests/fake_dgl.FakeDGLGraph
objects with the exact attribute surface the converter consumes (torch
tensors from all_edges(), number_of_nodes()). The day the real Google Drive
download is reachable, the same two commands run unmodified:

    python -c "from gmeta_tpu.data.io import convert_dgl_pickle; \
               convert_dgl_pickle('arxiv/graph_dgl.pkl', 'arxiv/graphs.npz')"
    python -m gmeta_tpu.run.train --preset arxiv --data_dir arxiv
"""

import csv
import os
import pickle

import numpy as np

from fake_dgl import FakeDGLGraph
from gmeta_tpu.data.io import convert_dgl_pickle, load_graphs_npz


def _random_graph(rng, n, m):
    return rng.randint(0, n, m), rng.randint(0, n, m)


def test_convert_preserves_in_edge_semantics(tmp_path):
    """Our CSR row v must list DGL's in_edges(v)[0] (sources of edges into
    v) — the semantics both frontier expansion and GCN normalization
    consume (subgraph_data_processing.py:301, learner.py:29)."""
    rng = np.random.RandomState(0)
    gs = []
    for n, m in ((40, 160), (25, 60)):
        src, dst = _random_graph(rng, n, m)
        gs.append(FakeDGLGraph(src, dst, n))
    pkl = tmp_path / "graph_dgl.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(gs, f)

    out = tmp_path / "graphs.npz"
    convert_dgl_pickle(str(pkl), str(out))
    loaded = load_graphs_npz(str(out))
    assert len(loaded) == 2
    for fake, g in zip(gs, loaded):
        assert g.num_nodes == fake.number_of_nodes()
        src, dst = (np.asarray(t) for t in fake.all_edges())
        assert g.num_edges == len(src)
        for v in range(g.num_nodes):
            want = np.sort(src[dst == v])
            got = np.sort(g.in_neighbors(v))
            np.testing.assert_array_equal(got, want)


def test_dgl_pickle_to_training_step(tmp_path):
    """Full real-data path: a dataset dir laid out exactly like the
    reference download (graph_dgl.pkl + features.npy + label.pkl + csvs),
    converted, loaded through build_datasets, one meta-train step runs and
    returns finite accuracies."""
    from gmeta_tpu.config import Config
    from gmeta_tpu.run.train import Trainer, build_datasets

    rng = np.random.RandomState(1)
    n = 300
    src, dst = _random_graph(rng, n, 2400)
    root = tmp_path / "ds"
    os.makedirs(root)
    with open(root / "graph_dgl.pkl", "wb") as f:
        pickle.dump([FakeDGLGraph(src, dst, n)], f)
    # single-graph 2-D features (auto-wrapped like train.py:63-65)
    np.save(root / "features.npy", rng.randn(n, 8).astype(np.float32))
    labels = {f"0_{i}": int(rng.randint(0, 9)) for i in range(n)}
    with open(root / "label.pkl", "wb") as f:
        pickle.dump(labels, f)
    # disjoint label-space split: labels 0-2 train, 3-5 val, 6-8 test
    for mode in ("train", "val", "test"):
        with open(root / f"{mode}.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["", "name", "label"])
            rows = [(k, v) for k, v in labels.items()
                    if ("train", "val", "test")[v // 3] == mode]
            w.writerows((i, k, v) for i, (k, v) in enumerate(rows))

    convert_dgl_pickle(str(root / "graph_dgl.pkl"), str(root / "graphs.npz"))

    cfg = Config(data_dir=str(root), n_way=3, k_spt=2, k_qry=3, h=2,
                 hidden_dim=8, epoch=1, task_num=2, update_step=2,
                 update_step_test=2, batchsz=4, eval_batchsz=2,
                 sample_nodes=50, train_result_report_steps=1,
                 extract_disk_cache=False, metrics_path="/dev/null")
    store, ds, labels_num = build_datasets(cfg)
    tr = Trainer(cfg, store, ds, labels_num=labels_num)
    batch = next(ds["train"].batches(cfg.task_num, shuffle=False))
    m = tr.learner.train_step(batch)
    accs = np.asarray(m["accs"])
    assert accs.shape == (cfg.update_step + 1,)
    assert np.all(np.isfinite(accs))
