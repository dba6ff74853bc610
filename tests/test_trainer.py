"""End-to-end driver tests on the CPU mesh: full fit protocol, metrics
stream, checkpoint/resume (SURVEY.md §4 tier 3)."""

import dataclasses
import json
import os

import numpy as np

from gmeta_tpu.config import Config
from gmeta_tpu.data.synthetic import synthetic_disjoint
from gmeta_tpu.run.train import Trainer
from gmeta_tpu.utils.metrics import MetricLogger


def _setup(tmp_path, epochs=2, ckpt=True):
    store, ds = synthetic_disjoint(
        num_graphs=1, nodes_per_graph=300, avg_degree=6, feat_dim=16,
        num_classes=9, n_way=3, k_spt=3, k_qry=4, batchsz=8, h=2,
        sample_nodes=64, seed=3)
    cfg = Config(n_way=3, k_spt=3, k_qry=4, h=2, hidden_dim=16,
                 epoch=epochs, task_num=4, update_step=2, update_step_test=3,
                 update_lr=0.05, meta_lr=1e-3, train_result_report_steps=1,
                 checkpoint_dir=str(tmp_path / "ckpt") if ckpt else "",
                 metrics_path=str(tmp_path / "metrics.jsonl"))
    return store, ds, cfg


def test_fit_end_to_end(tmp_path):
    store, ds, cfg = _setup(tmp_path)
    tr = Trainer(cfg, store, ds, labels_num=cfg.n_way)
    res = tr.fit()
    assert res.epochs_run == 2
    assert res.global_step == 4  # 8 tasks / task_num 4 = 2 steps x 2 epochs
    assert 0.0 <= res.test_acc_final <= 1.0
    assert 0.0 <= res.val_max_acc <= 1.0
    # metrics stream has train/val/fit_result records
    kinds = [json.loads(l)["kind"]
             for l in open(cfg.metrics_path)]
    assert "train_step" in kinds and "val" in kinds and "fit_result" in kinds
    # checkpoint written
    assert os.path.exists(os.path.join(cfg.checkpoint_dir, "latest"))


def test_resume_reproduces_state(tmp_path):
    store, ds, cfg = _setup(tmp_path, epochs=2)
    # run 2 epochs straight
    tr_full = Trainer(dataclasses.replace(cfg, checkpoint_dir="",
                                          metrics_path=""),
                      store, ds, labels_num=cfg.n_way)
    res_full = tr_full.fit()

    # run epoch 1 with checkpointing, then resume a fresh Trainer for epoch 2
    cfg1 = dataclasses.replace(cfg, epoch=1,
                               metrics_path=str(tmp_path / "m1.jsonl"))
    t1 = Trainer(cfg1, store, ds, labels_num=cfg.n_way)
    t1.fit()
    cfg2 = dataclasses.replace(cfg, epoch=2,
                               metrics_path=str(tmp_path / "m2.jsonl"))
    t2 = Trainer(cfg2, store, ds, labels_num=cfg.n_way)
    assert t2.start_epoch == 1  # resumed
    res_resumed = t2.fit()

    # Params after resumed epoch 2 == params after straight 2-epoch run:
    # same task order (epoch-seeded), same optimizer state.
    for a, b in zip(tr_full.learner.params, t2.learner.params):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    assert abs(res_full.test_acc_final - res_resumed.test_acc_final) < 1e-6


def test_eval_chunking_covers_all_tasks(tmp_path):
    store, ds, cfg = _setup(tmp_path, ckpt=False)
    tr = Trainer(cfg, store, ds, labels_num=cfg.n_way)
    curves = tr.evaluate("val")
    assert curves.shape == (len(ds["val"]), cfg.update_step_test + 1)


def test_device_pool_fit_matches_protocol():
    """device_task_pool=True (HBM-resident pool, scanned report windows)
    must run the identical protocol and produce a valid FitResult."""
    import numpy as np
    from gmeta_tpu.config import Config
    from gmeta_tpu.data.synthetic import synthetic_disjoint
    from gmeta_tpu.run.train import Trainer

    store, ds = synthetic_disjoint(num_graphs=1, nodes_per_graph=150,
                                   avg_degree=5, feat_dim=8, num_classes=9,
                                   n_way=3, k_spt=3, k_qry=4, batchsz=12,
                                   h=2, sample_nodes=60, seed=3)
    cfg = Config(n_way=3, k_spt=3, k_qry=4, h=2, hidden_dim=8, epoch=2,
                 task_num=4, update_step=2, update_step_test=2,
                 eval_batchsz=6, device_task_pool=True,
                 train_result_report_steps=2)
    tr = Trainer(cfg, store, ds, labels_num=3)
    r = tr.fit()
    assert 0.0 <= r.test_acc_final <= 1.0
    assert r.global_step == 2 * (12 // 4)
    assert np.isfinite(r.val_max_acc)


def test_meta_learning_beats_chance_on_homophilous_graph():
    """End-to-end learning signal (SURVEY.md §4 tier 3 stand-in for the
    arxiv recipe, whose dataset is an external download): on a homophilous
    class-signal graph, meta-test accuracy on UNSEEN classes must clearly
    beat 3-way chance (0.33). Reference run reaches ~0.9."""
    import io, contextlib
    from gmeta_tpu.config import Config
    from gmeta_tpu.data.synthetic import synthetic_disjoint
    from gmeta_tpu.run.train import Trainer
    store, ds = synthetic_disjoint(num_graphs=1, nodes_per_graph=600,
                                   avg_degree=6, feat_dim=16, num_classes=9,
                                   n_way=3, k_spt=3, k_qry=8, batchsz=48,
                                   h=2, sample_nodes=100, seed=0,
                                   class_signal=2.0, homophily=0.7)
    cfg = Config(n_way=3, k_spt=3, k_qry=8, h=2, hidden_dim=32, epoch=3,
                 task_num=8, update_step=5, update_step_test=5,
                 update_lr=0.05, meta_lr=2e-3, eval_batchsz=12,
                 device_task_pool=True, train_result_report_steps=6,
                 metrics_path="/dev/null")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        r = Trainer(cfg, store, ds, labels_num=3).fit()
    assert r.test_acc_final > 0.6, r


def test_midepoch_kill_resume_matches_straight_run(tmp_path):
    """Kill mid-epoch, resume from the step checkpoint, finish — params must
    match the uninterrupted run bitwise-to-tolerance (VERDICT item 7). The
    stream order is a pure function of (seed, epoch), so the saved in-epoch
    position alone reproduces the remaining batches."""
    store, ds, cfg = _setup(tmp_path, epochs=2, ckpt=False)
    # straight run: 2 epochs x 2 steps
    tr_full = Trainer(dataclasses.replace(cfg, metrics_path=""),
                      store, ds, labels_num=cfg.n_way)
    res_full = tr_full.fit()

    # interrupted run: checkpoint every step; abort after step 3 of 4
    # (mid-epoch 2) by raising from the metrics logger
    cfg_k = dataclasses.replace(
        cfg, checkpoint_dir=str(tmp_path / "ck_mid"),
        checkpoint_every_steps=1, metrics_path=str(tmp_path / "mk.jsonl"))
    tr_k = Trainer(cfg_k, store, ds, labels_num=cfg.n_way)

    class _Kill(Exception):
        pass

    orig = tr_k.learner.train_step
    calls = {"n": 0}

    def killing_step(batch):
        if calls["n"] == 3:
            raise _Kill()
        calls["n"] += 1
        return orig(batch)

    tr_k.learner.train_step = killing_step
    try:
        tr_k.fit()
        raise AssertionError("expected _Kill")
    except _Kill:
        pass

    # fresh process analog: new Trainer resumes from the step checkpoint
    tr_r = Trainer(cfg_k, store, ds, labels_num=cfg.n_way)
    assert tr_r.start_epoch == 1 and tr_r.start_batch == 1, (
        tr_r.start_epoch, tr_r.start_batch)
    res_r = tr_r.fit()
    assert res_r.global_step == res_full.global_step
    for a, b in zip(tr_full.learner.params, tr_r.learner.params):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_device_pool_midepoch_kill_resume(tmp_path):
    """Same kill-and-resume guarantee for the device-pool path (the bench's
    recommended fast path): checkpoint at window granularity, resume from the
    saved in-epoch step position, params match the straight run."""
    store, ds, cfg = _setup(tmp_path, epochs=2, ckpt=False)
    cfg = dataclasses.replace(cfg, device_task_pool=True,
                              train_result_report_steps=1)
    tr_full = Trainer(dataclasses.replace(cfg, metrics_path=""),
                      store, ds, labels_num=cfg.n_way)
    res_full = tr_full.fit()

    cfg_k = dataclasses.replace(
        cfg, checkpoint_dir=str(tmp_path / "ck_pool"),
        checkpoint_every_steps=1, metrics_path=str(tmp_path / "mp.jsonl"))
    tr_k = Trainer(cfg_k, store, ds, labels_num=cfg.n_way)

    class _Kill(Exception):
        pass

    # the pool path now prefers the compact-resident form; patch that
    orig = tr_k.learner.train_steps_from_compact
    calls = {"n": 0}

    def killing_steps(idx_mat):
        if calls["n"] == 3:  # abort mid-epoch 2 (window = 1 step)
            raise _Kill()
        calls["n"] += 1
        return orig(idx_mat)

    tr_k.learner.train_steps_from_compact = killing_steps
    try:
        tr_k.fit()
        raise AssertionError("expected _Kill")
    except _Kill:
        pass

    tr_r = Trainer(cfg_k, store, ds, labels_num=cfg.n_way)
    assert tr_r.start_epoch == 1 and tr_r.start_batch == 1, (
        tr_r.start_epoch, tr_r.start_batch)
    res_r = tr_r.fit()
    assert res_r.global_step == res_full.global_step
    for a, b in zip(tr_full.learner.params, tr_r.learner.params):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_multiworker_stream_matches_inline(tmp_path):
    """num_workers>0 must yield the identical batch sequence as the inline
    path (N producer threads + ordered reassembly)."""
    store, ds, cfg = _setup(tmp_path, ckpt=False)
    train = ds["train"]
    inline = list(train.batches(2, shuffle=True, seed=5, num_workers=0))
    threaded = list(train.batches(2, shuffle=True, seed=5, num_workers=3))
    assert len(inline) == len(threaded) == len(train) // 2
    import jax
    for a, b in zip(inline, threaded):
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_array_equal(x, y)


def _spy_host_pool(trainer):
    """Wrap _fit_host_pool so the test can assert the routing actually
    entered the host-windowed variant (round-4 advisor finding: earlier
    tests set a dead config field and exercised the compact path twice)."""
    hit = {"n": 0}
    orig = trainer._fit_host_pool

    def spy(*a, **k):
        hit["n"] += 1
        return orig(*a, **k)

    trainer._fit_host_pool = spy
    return hit


def test_host_pool_matches_device_pool(tmp_path):
    """The host-resident windowed pool (compact pool > compact_pool_hbm_gb)
    must produce BIT-IDENTICAL training to the device-resident pool: same
    epoch-seeded step stream, same scan program, only the pool's residence
    differs."""
    store, ds = synthetic_disjoint(num_graphs=1, nodes_per_graph=150,
                                   avg_degree=5, feat_dim=8, num_classes=9,
                                   n_way=3, k_spt=3, k_qry=4, batchsz=12,
                                   h=2, sample_nodes=60, seed=3)
    base = Config(n_way=3, k_spt=3, k_qry=4, h=2, hidden_dim=8, epoch=2,
                  task_num=4, update_step=2, update_step_test=2,
                  eval_batchsz=6, device_task_pool=True,
                  train_result_report_steps=2)
    tr_dev = Trainer(dataclasses.replace(base), store, ds, labels_num=3)
    r_dev = tr_dev.fit()

    # compact_pool_hbm_gb=0 forces the host-windowed variant; window=2 steps
    cfg = dataclasses.replace(base, compact_pool_hbm_gb=0.0,
                              host_pool_window=2,
                              metrics_path=str(tmp_path / "hp.jsonl"))
    tr_host = Trainer(cfg, store, ds, labels_num=3)
    hit = _spy_host_pool(tr_host)
    r_host = tr_host.fit()
    assert hit["n"] == 1, "host-windowed pool path was not entered"

    for a, b in zip(tr_dev.learner.params, tr_host.learner.params):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0)
    assert r_host.global_step == r_dev.global_step
    assert abs(r_host.test_acc_final - r_dev.test_acc_final) < 1e-9
    # the fallback is recorded in the metric stream
    lines = [json.loads(l) for l in open(cfg.metrics_path)]
    assert any(l["kind"] == "train_window" for l in lines)


def test_host_pool_midepoch_resume(tmp_path):
    """Killing a host-pool run mid-epoch and resuming reproduces the
    straight run (window-granular batch_in_epoch snapshots)."""
    store, ds = synthetic_disjoint(num_graphs=1, nodes_per_graph=150,
                                   avg_degree=5, feat_dim=8, num_classes=9,
                                   n_way=3, k_spt=3, k_qry=4, batchsz=16,
                                   h=2, sample_nodes=60, seed=3)
    base = Config(n_way=3, k_spt=3, k_qry=4, h=2, hidden_dim=8, epoch=1,
                  task_num=4, update_step=2, update_step_test=2,
                  eval_batchsz=6, device_task_pool=True,
                  compact_pool_hbm_gb=0.0,
                  host_pool_window=2, train_result_report_steps=2)
    straight = Trainer(dataclasses.replace(base), store, ds, labels_num=3)
    hit_s = _spy_host_pool(straight)
    straight.fit()
    assert hit_s["n"] == 1, "host-windowed pool path was not entered"

    # checkpoint every 2 steps = every window; stop after epoch "0.5" by
    # restoring from the first mid-epoch snapshot
    cfg1 = dataclasses.replace(base, checkpoint_dir=str(tmp_path / "ck"),
                               checkpoint_every_steps=2)
    t1 = Trainer(cfg1, store, ds, labels_num=3)
    t1.fit()
    # wipe all but the FIRST snapshot to simulate a mid-epoch kill
    d = cfg1.checkpoint_dir
    snaps = sorted(f for f in os.listdir(d) if f.startswith("ckpt_"))
    for f in snaps[1:]:
        os.remove(os.path.join(d, f))
    latest = os.path.join(d, "latest")
    os.remove(latest)
    os.symlink(snaps[0], latest)

    t2 = Trainer(cfg1, store, ds, labels_num=3)
    assert t2.start_batch > 0          # mid-epoch re-entry
    t2.fit()
    for a, b in zip(straight.learner.params, t2.learner.params):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0)


def test_compact_pool_and_task_chunk_match_streaming(tmp_path):
    """The compact HBM-resident pool AND the task-vmap chunking must both
    reproduce the plain streaming path's training bit-for-bit: identical
    decode (masks reconstructed, edges unpacked) and identical math
    (lax.map stacks like vmap)."""
    store, ds = synthetic_disjoint(num_graphs=1, nodes_per_graph=150,
                                   avg_degree=5, feat_dim=8, num_classes=9,
                                   n_way=3, k_spt=3, k_qry=4, batchsz=12,
                                   h=2, sample_nodes=60, seed=3)
    base = Config(n_way=3, k_spt=3, k_qry=4, h=2, hidden_dim=8, epoch=2,
                  task_num=4, update_step=2, update_step_test=2,
                  eval_batchsz=6, train_result_report_steps=2)
    tr_s = Trainer(dataclasses.replace(base), store, ds, labels_num=3)
    r_s = tr_s.fit()

    cfg_c = dataclasses.replace(base, device_task_pool=True,
                                task_vmap_chunk=3,   # non-divisor of 4
                                metrics_path=str(tmp_path / "c.jsonl"))
    tr_c = Trainer(cfg_c, store, ds, labels_num=3)
    r_c = tr_c.fit()
    assert tr_c.learner._cpool is not None      # compact path engaged
    lines = [json.loads(l) for l in open(cfg_c.metrics_path)]
    assert any(l["kind"] == "train_window" for l in lines)

    for a, b in zip(tr_s.learner.params, tr_c.learner.params):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    assert abs(r_s.test_acc_final - r_c.test_acc_final) < 1e-6
