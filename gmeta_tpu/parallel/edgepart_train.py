"""Edge-partitioned META-TRAINING: the full ProtoMAML inner/outer loop over
a graph sharded across the 'edge' mesh axis, with task-DP over 'task'.

This is the rebuild's Tree-of-Life path (SURVEY.md §5.7, §2.3 "SP analog";
VERDICT r2 item 2): the reference trains ToL link-pred by extracting local
subgraphs from 68.6 GB of host RAM (test.ipynb cell 4) — here a graph whose
(V, H) activations exceed one chip's HBM is partitioned by edges across
chips and the WHOLE meta-train step (inner SGD on fast weights, prototype
losses, meta-gradient, Adam) runs sharded:

- mesh ('task', 'edge'): the graph (features, edge shards, halo plan) is
  sharded over 'edge' and replicated over 'task'; the meta-batch of tasks
  is sharded over 'task'; params/opt-state are replicated.
- each GCN layer ships only the boundary rows other shards' edges actually
  reference (OverlapPlan.send_idx) through one all_to_all, and aggregates
  LOCAL edges while that collective is in flight — halo/compute overlap
  (the all_to_all result is only consumed by the remote-edge segment-sum,
  so XLA's latency-hiding scheduler runs it concurrently with the local
  segment-sum).
- center readout: each shard contributes the embedding rows it owns, a
  psum over 'edge' assembles the (S, H) center matrix on every shard.
- gradients: shard_map's AD transposes the collectives (readout psum,
  boundary all_to_all), so per-shard grads already equal the full
  unsharded gradient over 'edge'; only the task-DP pmean over 'task' is
  explicit. The NaN skip guard and first-order semantics match
  meta/maml.py.

Tasks are processed SEQUENTIALLY within a shard (lax.scan over the local
task axis) so full-graph activations exist for ONE task at a time — the
memory posture that makes the partitioned graph fit at all (a vmap over
tasks would multiply (Vb, H) activations by the task count).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gmeta_tpu.data.graph import CSRGraph
from gmeta_tpu.meta.protonet import proto_loss_spt, proto_loss_qry
from gmeta_tpu.parallel.edgepart import (OverlapPlan, ShardedGraph,
                                         build_overlap_plan, pad_features,
                                         shard_graph)


class EdgePartTask(NamedTuple):
    """A meta-batch of tasks over ONE partitioned graph. Centers are GLOBAL
    node ids; for link tasks the trailing axis holds both endpoints, for
    node tasks both columns carry the same id (pack.py convention)."""
    spt_centers: np.ndarray   # (T, S_spt, 2) int32
    spt_labels: np.ndarray    # (T, S_spt) int32
    qry_centers: np.ndarray   # (T, S_qry, 2) int32
    qry_labels: np.ndarray    # (T, S_qry) int32


class EdgePartMetaTrainer:
    """Owns params/opt-state and the jitted sharded meta-train step."""

    def __init__(self, layer_dims: Sequence[Tuple[int, int]],
                 head: Tuple[int, int], n_classes: int, *,
                 g: CSRGraph, feats: np.ndarray, mesh: Mesh,
                 link_pred: bool = False,
                 update_lr: float = 0.01, meta_lr: float = 1e-3,
                 update_step: int = 5, update_step_test: int = None,
                 first_order: bool = True,
                 seed: int = 222):
        from gmeta_tpu.models.gcn import init_params

        self.mesh = mesh
        self.n_tasks_axis = mesh.shape["task"]
        D = mesh.shape["edge"]
        self.link_pred = link_pred
        spec = [("GraphConv", d) for d in layer_dims] + [("Linear", head)]
        if link_pred:
            spec += [("LinkPred", (True,))]
        self.params = init_params(jax.random.PRNGKey(seed), tuple(spec))
        self.tx = optax.adam(meta_lr)
        self.opt_state = self.tx.init(self.params)

        sg = shard_graph(g, D)
        plan = build_overlap_plan(sg, D)
        self.plan = plan
        self.sg = sg
        self.comm_rows_per_layer = plan.comm_rows

        edge_shd = NamedSharding(mesh, P("edge"))
        rep = NamedSharding(mesh, P())

        def put_e(a):
            return jax.device_put(
                jnp.asarray(np.reshape(a, (-1,) + a.shape[2:])), edge_shd)

        h0 = pad_features(np.asarray(feats, np.float32), sg, D)
        self._graph_args = (
            jax.device_put(jnp.asarray(h0), edge_shd),
            put_e(plan.local_src), put_e(plan.local_dst),
            put_e(plan.local_mask),
            put_e(plan.remote_src), put_e(plan.remote_dst),
            put_e(plan.remote_mask),
            put_e(plan.send_idx), put_e(plan.send_mask),
            jax.device_put(jnp.asarray(
                np.reshape(sg.deg, (-1,)), np.float32), edge_shd),
        )
        self._rep = rep

        Vb, M = sg.Vb, plan.M

        def gcn_embed(w, h, local_src, local_dst, local_mask,
                      remote_src, remote_dst, remote_mask,
                      send_idx, send_mask, norm):
            # h: (Vb, H) this shard's rows
            for i, _ in enumerate(layer_dims):
                W, b = w[2 * i], w[2 * i + 1]
                h = h * norm
                if D > 1:
                    # issue the boundary exchange FIRST...
                    send = h[send_idx] * send_mask[..., None]      # (D, M, H)
                    recv = jax.lax.all_to_all(send, "edge", split_axis=0,
                                              concat_axis=0, tiled=False)
                    table = recv.reshape(D * M, -1)
                # ...aggregate local edges while it is in flight...
                local = jax.ops.segment_sum(
                    h[local_src] * local_mask[:, None], local_dst,
                    num_segments=Vb, indices_are_sorted=True)
                if D > 1:
                    # ...then fold in the remote contribution.
                    remote = jax.ops.segment_sum(
                        table[remote_src] * remote_mask[:, None], remote_dst,
                        num_segments=Vb, indices_are_sorted=True)
                    agg = local + remote
                else:
                    # single shard: every edge is local; the zero-size halo
                    # all_to_all is skipped STATICALLY (D is a trace-time
                    # constant) — the degenerate (1, 0, H) collective
                    # crashed the TPU runtime on the 5.33M-node ToL union
                    agg = local
                h = jnp.dot(agg, W, preferred_element_type=jnp.float32)
                h = h * norm + b
                h = jax.nn.relu(h)
            return h

        def readout(emb, centers):
            # centers: (S, 2) GLOBAL ids -> (S, H) or (S, 2H) via psum
            d = jax.lax.axis_index("edge")
            def one_col(col):
                local = centers[:, col] - d * Vb
                owned = (local >= 0) & (local < Vb)
                rows = jnp.where(owned[:, None],
                                 emb[jnp.clip(local, 0, Vb - 1)], 0.0)
                return jax.lax.psum(rows, "edge")
            x0 = one_col(0)
            if link_pred:
                return jnp.concatenate([x0, one_col(1)], axis=1)
            return x0

        def head_logits(w, x):
            W, b = w[2 * len(layer_dims)], w[2 * len(layer_dims) + 1]
            return jnp.dot(x, W.T, preferred_element_type=jnp.float32) + b

        # Gradient reductions across the mesh, made explicit through jax's
        # varying-manual-axes (vma) discipline:
        #
        # 'edge': NO manual reduction. jax.grad transposes the collectives
        # themselves (the readout psum redistributes cotangents, the
        # all_to_all reverses the boundary routing), so each shard's grad
        # already equals the full unsharded gradient — verified against
        # the single-device oracle in tests/test_edgepart_train.py; a
        # manual psum here would multiply GCN grads by the shard count.
        #
        # 'task': params enter replicated (task-UNVARYING) while the loss
        # is task-varying. Differentiating that directly makes jax force
        # the cotangent back to unvarying by inserting a psum over 'task'
        # at an arbitrary interior point, which MIXES gradients across
        # task groups mid-computation and corrupts the inner loop
        # (reproduced + verified in tests/test_edgepart_train.py round 3).
        # The fix: pvary the params at the TOP of the loss. Inside, all
        # autodiff is then consistently task-varying (per-group fast
        # weights, per-group grads); the pvary's own transpose is a psum
        # over 'task' at exactly the right place — the outer grads arrive
        # pre-summed over task groups, i.e. the DP reduction comes out of
        # AD for free. Divide by the group count for the mean.
        def _pvary_task(tree):
            return jax.tree.map(
                lambda x: jax.lax.pcast(x, "task", to="varying"), tree)

        def task_inner(params, spt_c, spt_y, qry_c, qry_y, graph):
            def spt_loss(w):
                emb = gcn_embed(w, *graph)
                logits = head_logits(w, readout(emb, spt_c))
                loss, acc, protos = proto_loss_spt(logits, spt_y, n_classes)
                return loss, (acc, protos)

            def step(w, _):
                (_, (_, protos)), g = jax.value_and_grad(
                    spt_loss, has_aux=True)(w)
                if first_order:
                    g = jax.tree.map(jax.lax.stop_gradient, g)
                w = jax.tree.map(lambda p, gi: p - update_lr * gi, w, g)
                return w, protos

            w, protos_all = jax.lax.scan(step, params, None,
                                         length=update_step)
            protos = jax.tree.map(lambda p: p[-1], protos_all)
            emb = gcn_embed(w, *graph)
            logits = head_logits(w, readout(emb, qry_c))
            return proto_loss_qry(logits, qry_y, protos)

        def shard_fn(params, opt_state, h0, *rest):
            (local_src, local_dst, local_mask, remote_src, remote_dst,
             remote_mask, send_idx, send_mask, deg,
             spt_c, spt_y, qry_c, qry_y) = rest
            norm = jax.lax.rsqrt(jnp.maximum(deg, 1.0))[:, None]
            graph = (h0, local_src, local_dst, local_mask,
                     remote_src, remote_dst, remote_mask,
                     send_idx, send_mask, norm)

            def meta_loss(p):
                p = _pvary_task(p)
                def body(_, t):
                    loss, acc = task_inner(
                        p, spt_c[t], spt_y[t], qry_c[t], qry_y[t], graph)
                    return None, (loss, acc)
                _, (losses, accs) = jax.lax.scan(
                    body, None, jnp.arange(spt_c.shape[0]))
                return losses.mean(), accs.mean()

            (loss, acc), grads = jax.value_and_grad(
                meta_loss, has_aux=True)(params)
            # pvary's transpose already psum'd grads over 'task'; scale the
            # sum of per-group means into the global mean
            nt = mesh.shape["task"]
            grads = jax.tree.map(lambda gi: gi / nt, grads)
            loss = jax.lax.pmean(loss, "task")
            acc = jax.lax.pmean(acc, "task")
            updates, new_opt = self.tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            ok = jnp.isfinite(loss)                   # NaN skip (meta.py:163)
            params = jax.tree.map(
                lambda n, o: jnp.where(ok, n, o), new_params, params)
            opt_state = jax.tree.map(
                lambda n, o: jnp.where(ok, n, o), new_opt, opt_state)
            return params, opt_state, {
                "meta_loss": loss, "qry_acc": acc,
                "nan_skip": (~ok).astype(jnp.int32)}

        graph_specs = (P("edge"),) * 10
        task_specs = (P("task"),) * 4
        self._step = jax.jit(shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P()) + graph_specs + task_specs,
            out_specs=(P(), P(), P())))

        # ---- evaluation: the reference finetune curve, sharded ------------
        # Same inner loop as train but update_step_test steps, no meta-grad,
        # and a query evaluation BEFORE the first step and after every step
        # — the (K+1,) accuracy curve of train.py:115-141 / meta.py:129-141.
        K_test = update_step if update_step_test is None else update_step_test
        self.update_step_test = K_test

        def task_finetune(params, spt_c, spt_y, qry_c, qry_y, graph):
            def spt_loss(w):
                emb = gcn_embed(w, *graph)
                logits = head_logits(w, readout(emb, spt_c))
                loss, _, protos = proto_loss_spt(logits, spt_y, n_classes)
                return loss, protos

            def qry_acc(w, protos):
                emb = gcn_embed(w, *graph)
                logits = head_logits(w, readout(emb, qry_c))
                return proto_loss_qry(logits, qry_y, protos)[1]

            # step 0: theta + theta-derived prototypes (meta.py:129-134)
            _, protos0 = spt_loss(params)
            a0 = qry_acc(params, protos0)

            def step(w, _):
                # prototypes refreshed from the PRE-update weights, query
                # evaluated at the POST-update weights (meta.py:143-157)
                (_, protos), g = jax.value_and_grad(
                    spt_loss, has_aux=True)(w)
                w = jax.tree.map(lambda p, gi: p - update_lr * gi, w, g)
                return w, qry_acc(w, protos)

            _, accs = jax.lax.scan(step, params, None, length=K_test)
            return jnp.concatenate([a0[None], accs])

        def ft_shard_fn(params, h0, *rest):
            (local_src, local_dst, local_mask, remote_src, remote_dst,
             remote_mask, send_idx, send_mask, deg,
             spt_c, spt_y, qry_c, qry_y) = rest
            norm = jax.lax.rsqrt(jnp.maximum(deg, 1.0))[:, None]
            graph = (h0, local_src, local_dst, local_mask,
                     remote_src, remote_dst, remote_mask,
                     send_idx, send_mask, norm)
            p = _pvary_task(params)

            def body(_, t):
                return None, task_finetune(
                    p, spt_c[t], spt_y[t], qry_c[t], qry_y[t], graph)
            _, curves = jax.lax.scan(body, None,
                                     jnp.arange(spt_c.shape[0]))
            return curves                       # (T_local, K_test+1)

        self._finetune = jax.jit(shard_map(
            ft_shard_fn, mesh=mesh,
            in_specs=(P(),) + graph_specs + task_specs,
            out_specs=P("task")))

    def finetune_batch(self, task: EdgePartTask, params=None) -> np.ndarray:
        """(T, update_step_test+1) query-accuracy curves — the sharded
        equivalent of MetaLearner.finetune_batch (val/test protocol,
        train.py:115-141). `params` evaluates a snapshot (best model)."""
        T = task.spt_centers.shape[0]
        assert T % self.n_tasks_axis == 0, (T, self.n_tasks_axis)
        task_shd = NamedSharding(self.mesh, P("task"))
        args = tuple(
            jax.device_put(jnp.asarray(np.asarray(a, np.int32)), task_shd)
            for a in task)
        p = self.params if params is None else params
        return np.asarray(self._finetune(p, *self._graph_args, *args))

    def train_step(self, task: EdgePartTask):
        T = task.spt_centers.shape[0]
        assert T % self.n_tasks_axis == 0, (T, self.n_tasks_axis)
        task_shd = NamedSharding(self.mesh, P("task"))
        args = tuple(
            jax.device_put(jnp.asarray(np.asarray(a, np.int32)), task_shd)
            for a in task)
        self.params, self.opt_state, metrics = self._step(
            self.params, self.opt_state, *self._graph_args, *args)
        return metrics
