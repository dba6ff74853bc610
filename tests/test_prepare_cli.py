"""On-disk round trip: prepare datasets in the reference format, then drive
the full CLI (`gmeta_tpu.run.train.main`) over them — all three regimes."""

import numpy as np
import pytest

from gmeta_tpu.data.graph import synthetic_store
from gmeta_tpu.data.io import Dataset, load_csv_index
from gmeta_tpu.data.prepare import (prepare_link, prepare_node_disjoint,
                                    prepare_node_shared)
from gmeta_tpu.run.train import main


def _node_data(num_graphs=2, n=150, classes=9, seed=0):
    store, labels = synthetic_store(num_graphs=num_graphs, nodes_per_graph=n,
                                    avg_degree=6, feat_dim=8,
                                    num_classes=classes, seed=seed,
                                    class_signal=2.0)
    feats = [store.features[store.node_offsets[g]:store.node_offsets[g + 1]]
             for g in range(num_graphs)]
    return store.graphs, feats, labels


def test_node_disjoint_roundtrip_and_cli(tmp_path):
    graphs, feats, labels = _node_data()
    out = str(tmp_path / "ds")
    prepare_node_disjoint(out, graphs, feats, labels, num_label_set=3, seed=0)

    data = Dataset(out, "Disjoint", False)
    assert data.store.num_graphs == 2
    assert data.total_class == 9
    # label spaces must be disjoint across splits
    def label_set(mode):
        return set(data.splits[mode]["main"].dictLabels.keys())
    assert not (label_set("train") & label_set("val"))
    assert not (label_set("train") & label_set("test"))

    res = main([
        "--data_dir", out, "--task_setup", "Disjoint", "--n_way", "3",
        "--k_spt", "2", "--k_qry", "3", "--h", "2", "--hidden_dim", "8",
        "--epoch", "1", "--task_num", "2", "--batchsz", "4",
        "--eval_batchsz", "4", "--update_step", "2", "--update_step_test", "2",
        "--sample_nodes", "32", "--train_result_report_steps", "1",
    ])
    assert 0.0 <= res.test_acc_final <= 1.0


def test_node_shared_folds_and_cli(tmp_path):
    graphs, feats, labels = _node_data(num_graphs=4, classes=3)
    out = str(tmp_path / "ds")
    prepare_node_shared(out, graphs, feats, labels, folds=[(0, 1), (2, 3)])

    res = main([
        "--data_dir", str(tmp_path / "ds" / "fold1"), "--task_setup", "Shared",
        "--k_spt", "2", "--k_qry", "3", "--h", "2", "--hidden_dim", "8",
        "--epoch", "1", "--task_num", "2", "--batchsz", "4",
        "--eval_batchsz", "4", "--update_step", "2", "--update_step_test", "2",
        "--sample_nodes", "32", "--train_result_report_steps", "1",
    ])
    assert 0.0 <= res.test_acc_final <= 1.0


def test_link_pred_roundtrip_and_cli(tmp_path):
    rng = np.random.RandomState(0)
    num_graphs, n = 5, 80
    pos, feats = [], []
    for g in range(num_graphs):
        m = 160
        a = rng.randint(0, n, m)
        b = rng.randint(0, n, m)
        keep = a < b
        pairs = np.unique(a[keep] * n + b[keep])
        pos.append(np.stack([pairs // n, pairs % n], 1))
        feats.append(rng.randn(n, 8).astype(np.float32))
    out = str(tmp_path / "ds")
    prepare_link(out, pos, [n] * num_graphs, feats, seed=0)

    data = Dataset(out, "Shared", True)
    # every split has spt/qry indices and binary labels
    for mode in ("train", "val", "test"):
        assert set(data.splits[mode]["spt"].dictLabels) <= {"0", "1"}

    res = main([
        "--data_dir", out, "--task_setup", "Shared", "--link_pred_mode", "True",
        "--n_way", "2", "--k_spt", "4", "--k_qry", "4", "--h", "2",
        "--hidden_dim", "8", "--epoch", "1", "--task_num", "2",
        "--batchsz", "4", "--eval_batchsz", "4", "--update_step", "2",
        "--update_step_test", "2", "--sample_nodes", "48",
        "--train_result_report_steps", "1",
    ])
    assert 0.0 <= res.test_acc_final <= 1.0
