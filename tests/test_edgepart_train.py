"""Edge-partitioned META-TRAINING vs a single-device oracle (VERDICT r2
item 2): one full ProtoMAML meta-step over a graph sharded across
'edge' x task-DP over 'task' must reproduce the unsharded computation."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gmeta_tpu.data.graph import synthetic_store
from gmeta_tpu.meta.protonet import proto_loss_spt, proto_loss_qry
from gmeta_tpu.models.gcn import init_params
from gmeta_tpu.parallel.edgepart_train import EdgePartMetaTrainer, EdgePartTask
from gmeta_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def _oracle_trainer(layer_dims, head, n_classes, g, feats, link_pred,
                    update_lr, meta_lr, update_step, seed):
    """Unsharded reference: full-graph GCN by plain segment_sum + the same
    ProtoMAML inner/outer loop, all on one device."""
    V = g.num_nodes
    dst = jnp.asarray(np.repeat(np.arange(V), np.diff(g.indptr)))
    src = jnp.asarray(g.indices.astype(np.int64))
    deg = jnp.asarray(np.diff(g.indptr).astype(np.float32))
    norm = jax.lax.rsqrt(jnp.maximum(deg, 1.0))[:, None]
    feats = jnp.asarray(feats, jnp.float32)
    spec = [("GraphConv", d) for d in layer_dims] + [("Linear", head)]
    if link_pred:
        spec += [("LinkPred", (True,))]
    params = init_params(jax.random.PRNGKey(seed), tuple(spec))
    tx = optax.adam(meta_lr)
    opt_state = tx.init(params)

    def embed(w):
        h = feats
        for i, _ in enumerate(layer_dims):
            W, b = w[2 * i], w[2 * i + 1]
            h = h * norm
            agg = jax.ops.segment_sum(h[src], dst, num_segments=V,
                                      indices_are_sorted=True)
            h = jnp.dot(agg, W, preferred_element_type=jnp.float32)
            h = h * norm + b
            h = jax.nn.relu(h)
        return h

    def logits_of(w, centers):
        emb = embed(w)
        x = emb[centers[:, 0]]
        if link_pred:
            x = jnp.concatenate([x, emb[centers[:, 1]]], axis=1)
        W, b = w[2 * len(layer_dims)], w[2 * len(layer_dims) + 1]
        return jnp.dot(x, W.T, preferred_element_type=jnp.float32) + b

    def task_inner(p, spt_c, spt_y, qry_c, qry_y):
        def spt_loss(w):
            loss, acc, protos = proto_loss_spt(
                logits_of(w, spt_c), spt_y, n_classes)
            return loss, protos

        def step(w, _):
            (_, protos), gr = jax.value_and_grad(spt_loss, has_aux=True)(w)
            gr = jax.tree.map(jax.lax.stop_gradient, gr)
            w = jax.tree.map(lambda a, b: a - update_lr * b, w, gr)
            return w, protos

        w, protos_all = jax.lax.scan(step, p, None, length=update_step)
        protos = jax.tree.map(lambda x: x[-1], protos_all)
        return proto_loss_qry(logits_of(w, qry_c), qry_y, protos)

    @jax.jit
    def train_step(params, opt_state, spt_c, spt_y, qry_c, qry_y):
        def meta_loss(p):
            losses, accs = jax.vmap(task_inner, in_axes=(None, 0, 0, 0, 0))(
                p, spt_c, spt_y, qry_c, qry_y)
            return losses.mean(), accs.mean()
        (loss, acc), grads = jax.value_and_grad(
            meta_loss, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, acc

    return params, opt_state, train_step


def _make_task(rng, V, n_classes, T, S, link_pred):
    if link_pred:
        c_spt = rng.randint(0, V, size=(T, S, 2))
        c_qry = rng.randint(0, V, size=(T, S, 2))
    else:
        c = rng.randint(0, V, size=(T, S, 1))
        c_spt = np.concatenate([c, c], axis=2)
        c = rng.randint(0, V, size=(T, S, 1))
        c_qry = np.concatenate([c, c], axis=2)
    # balanced labels (the proto losses assume balance, meta.py:37,63)
    y = np.tile(np.arange(n_classes), S // n_classes + 1)[:S]
    y_spt = np.tile(y, (T, 1))
    return EdgePartTask(c_spt.astype(np.int32), y_spt.astype(np.int32),
                        c_qry.astype(np.int32), y_spt.astype(np.int32))


@pytest.mark.parametrize("link_pred", [False, True])
def test_edgepart_meta_train_matches_oracle(link_pred):
    store, _ = synthetic_store(1, 257, 6, 8, 3, seed=5)
    g = store.graphs[0]
    layer_dims = [(8, 16), (16, 16)]
    head = (16, 3)
    mesh = make_mesh(task=2, edge=4)
    tr = EdgePartMetaTrainer(layer_dims, head, 3, g=g,
                             feats=store.features, mesh=mesh,
                             link_pred=link_pred, update_lr=0.05,
                             meta_lr=1e-3, update_step=3, seed=11)
    o_params, o_opt, o_step = _oracle_trainer(
        layer_dims, head, 3, g, store.features, link_pred,
        0.05, 1e-3, 3, seed=11)
    for a, b in zip(tr.params, o_params):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    rng = np.random.RandomState(0)
    for it in range(2):
        task = _make_task(rng, g.num_nodes, 3, T=4, S=6, link_pred=link_pred)
        m = tr.train_step(task)
        o_params, o_opt, o_loss, o_acc = o_step(
            o_params, o_opt, jnp.asarray(task.spt_centers),
            jnp.asarray(task.spt_labels), jnp.asarray(task.qry_centers),
            jnp.asarray(task.qry_labels))
        np.testing.assert_allclose(float(m["meta_loss"]), float(o_loss),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(m["qry_acc"]), float(o_acc),
                                   rtol=1e-4, atol=1e-5)
        # The head bias's true gradient is EXACTLY zero (a uniform logit
        # shift cancels in prototype distances), so Adam's g/sqrt(v)
        # amplifies float noise to ~±meta_lr there in both implementations
        # — compare it at meta_lr scale, everything else tightly.
        for i, (a, b) in enumerate(zip(tr.params, o_params)):
            if i == len(tr.params) - 1:
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=3e-3)
            else:
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=2e-4, atol=1e-5)


def test_overlap_plan_partitions_all_edges():
    """local + remote edge counts must cover every edge exactly once, and
    the boundary send plan must ship only rows other shards reference."""
    from gmeta_tpu.parallel.edgepart import build_overlap_plan, shard_graph
    store, _ = synthetic_store(1, 300, 7, 4, 3, seed=9)
    g = store.graphs[0]
    sg = shard_graph(g, 4)
    plan = build_overlap_plan(sg, 4)
    assert plan.local_edges + plan.remote_edges == g.num_edges
    assert plan.comm_rows <= 4 * g.num_nodes
    # remote halo indices must be in range of the receive table
    assert plan.remote_src.max() < 4 * plan.M


def test_edgepart_finetune_matches_oracle():
    """The sharded finetune curve (val/test protocol) must equal the
    unsharded inner loop evaluated step by step."""
    store, _ = synthetic_store(1, 257, 6, 8, 3, seed=5)
    g = store.graphs[0]
    layer_dims = [(8, 16), (16, 16)]
    head = (16, 3)
    mesh = make_mesh(task=2, edge=4)
    K = 4
    tr = EdgePartMetaTrainer(layer_dims, head, 3, g=g,
                             feats=store.features, mesh=mesh,
                             update_lr=0.05, meta_lr=1e-3, update_step=2,
                             update_step_test=K, seed=11)
    o_params, _, _ = _oracle_trainer(
        layer_dims, head, 3, g, store.features, False, 0.05, 1e-3, 2,
        seed=11)

    rng = np.random.RandomState(3)
    task = _make_task(rng, g.num_nodes, 3, T=4, S=6, link_pred=False)
    curves = tr.finetune_batch(task)
    assert curves.shape == (4, K + 1)

    # oracle curve, one task at a time
    V = g.num_nodes
    dst = jnp.asarray(np.repeat(np.arange(V), np.diff(g.indptr)))
    src = jnp.asarray(g.indices.astype(np.int64))
    deg = jnp.asarray(np.diff(g.indptr).astype(np.float32))
    norm = jax.lax.rsqrt(jnp.maximum(deg, 1.0))[:, None]
    feats = jnp.asarray(store.features, jnp.float32)

    def embed(w):
        h = feats
        for i, _ in enumerate(layer_dims):
            W, b = w[2 * i], w[2 * i + 1]
            h = h * norm
            agg = jax.ops.segment_sum(h[src], dst, num_segments=V,
                                      indices_are_sorted=True)
            h = jnp.dot(agg, W, preferred_element_type=jnp.float32)
            h = h * norm + b
            h = jax.nn.relu(h)
        return h

    def logits_of(w, centers):
        emb = embed(w)
        W, b = w[2 * len(layer_dims)], w[2 * len(layer_dims) + 1]
        return jnp.dot(emb[centers[:, 0]], W.T,
                       preferred_element_type=jnp.float32) + b

    for t in range(4):
        spt_c = jnp.asarray(task.spt_centers[t])
        spt_y = jnp.asarray(task.spt_labels[t])
        qry_c = jnp.asarray(task.qry_centers[t])
        qry_y = jnp.asarray(task.qry_labels[t])

        def spt_loss(w):
            loss, _, protos = proto_loss_spt(logits_of(w, spt_c), spt_y, 3)
            return loss, protos

        def qry_acc(w, protos):
            return proto_loss_qry(logits_of(w, qry_c), qry_y, protos)[1]

        w = o_params
        _, protos = spt_loss(w)
        expect = [float(qry_acc(w, protos))]
        for _ in range(K):
            (_, protos), gr = jax.value_and_grad(spt_loss, has_aux=True)(w)
            w = jax.tree.map(lambda a, b: a - 0.05 * b, w, gr)
            expect.append(float(qry_acc(w, protos)))
        np.testing.assert_allclose(curves[t], expect, rtol=1e-4, atol=1e-5)


def test_edgepart_trainer_full_protocol(tmp_path):
    """EdgePartTrainer runs the reference's whole protocol (epoch loop, val
    early-stop, dual test, checkpoint) on an 8-device ('task','edge') mesh
    over a multi-graph union, and a resumed run picks up the epoch count."""
    from gmeta_tpu.config import Config
    from gmeta_tpu.data.synthetic import synthetic_link_pred
    from gmeta_tpu.run.edgepart import (EdgePartTrainer, episodes_to_tasks,
                                        union_graph)

    store, datasets = synthetic_link_pred(
        num_graphs=5, nodes_per_graph=120, avg_degree=6, feat_dim=8,
        k_spt=4, k_qry=4, batchsz=8, seed=2)
    g = union_graph(store)
    assert g.num_nodes == store.node_offsets[-1]
    assert g.num_edges == sum(gr.num_edges for gr in store.graphs)

    tasks = {m: episodes_to_tasks(ds.sampler, ds.labels, store, "Shared")
             for m, ds in datasets.items()}
    cfg = Config(task_setup="Shared", link_pred_mode=True, n_way=2,
                 k_spt=4, k_qry=4, h=2, epoch=2, task_num=4, batchsz=8,
                 hidden_dim=16, update_step=2, update_step_test=3,
                 checkpoint_dir=str(tmp_path / "ck"),
                 metrics_path=str(tmp_path / "m.jsonl"))
    mesh = make_mesh(task=2, edge=4)
    tr = EdgePartTrainer(cfg, store, tasks, 2, mesh)
    assert tr.comm["comm_rows_per_layer"] < tr.comm["allgather_rows_per_layer"]
    res = tr.fit()
    assert res.epochs_run == 2
    assert 0.0 <= res.test_acc_final <= 1.0
    assert np.isfinite(res.val_max_acc)

    # resume: a fresh trainer restores epoch/step and skips straight to done
    tr2 = EdgePartTrainer(cfg, store, tasks, 2, mesh)
    assert tr2.start_epoch == 2
    assert tr2.global_step == res.global_step


def test_edgepart_midepoch_kill_resume(tmp_path):
    """Step-granular checkpointing on the edgepart path (VERDICT r4 item
    6): kill mid-epoch, resume from the step snapshot, finish — params
    match the uninterrupted run. The epoch's step stream is a pure
    function of (seed, epoch), so the saved position pins the remainder."""
    import dataclasses

    from gmeta_tpu.config import Config
    from gmeta_tpu.data.synthetic import synthetic_link_pred
    from gmeta_tpu.run.edgepart import EdgePartTrainer, episodes_to_tasks

    store, datasets = synthetic_link_pred(
        num_graphs=5, nodes_per_graph=120, avg_degree=6, feat_dim=8,
        k_spt=4, k_qry=4, batchsz=8, seed=2)
    tasks = {m: episodes_to_tasks(ds.sampler, ds.labels, store, "Shared")
             for m, ds in datasets.items()}
    base = Config(task_setup="Shared", link_pred_mode=True, n_way=2,
                  k_spt=4, k_qry=4, h=2, epoch=2, task_num=4, batchsz=8,
                  hidden_dim=16, update_step=2, update_step_test=3,
                  metrics_path="/dev/null")
    mesh = make_mesh(task=2, edge=4)
    straight = EdgePartTrainer(base, store, tasks, 2, mesh)
    res_full = straight.fit()

    # interrupted run: checkpoint every step; abort at step 3 of 4
    # (mid-epoch 2)
    cfg_k = dataclasses.replace(
        base, checkpoint_dir=str(tmp_path / "ck_mid"),
        checkpoint_every_steps=1)
    tr_k = EdgePartTrainer(cfg_k, store, tasks, 2, mesh)

    class _Kill(Exception):
        pass

    orig = tr_k.engine.train_step
    calls = {"n": 0}

    def killing_step(task):
        if calls["n"] == 3:
            raise _Kill()
        calls["n"] += 1
        return orig(task)

    tr_k.engine.train_step = killing_step
    try:
        tr_k.fit()
        raise AssertionError("expected _Kill")
    except _Kill:
        pass

    tr_r = EdgePartTrainer(cfg_k, store, tasks, 2, mesh)
    assert tr_r.start_epoch == 1 and tr_r.start_batch == 1, (
        tr_r.start_epoch, tr_r.start_batch)
    res_r = tr_r.fit()
    assert res_r.global_step == res_full.global_step
    for a, b in zip(straight.engine.params, tr_r.engine.params):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
