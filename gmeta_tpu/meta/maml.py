"""ProtoMAML as pure jitted functions.

The reference's meta-engine (G-Meta/meta.py:82-244) rebuilt TPU-first:

- the inner loop is a `lax.scan` over `update_step` SGD steps on functional
  fast weights, instead of a Python loop over torch.autograd.grad
  (meta.py:143-157). Per step: support forward -> proto loss (prototypes
  refreshed) -> grad -> fast-weight update -> query eval with the *fresh*
  prototypes and *updated* weights — the reference's exact ordering.
- FIRST-ORDER by default: the reference never sets create_graph
  (meta.py:125,149), so inner grads are detached; meta-gradients flow only
  through the linear theta-term of the fast weights and through the
  prototypes. `first_order=False` gives full second-order MAML (in JAX:
  just don't stop_gradient).
- the meta-batch is `jax.vmap`-ed over tasks instead of the reference's
  sequential Python task loop (meta.py:118), and the outer step is Adam on
  the mean last-step query loss with the reference's NaN skip guard
  (meta.py:161-169) — surfaced as a counted metric instead of silence.
- `finetunning` (meta.py:175-234) needs no deepcopy: parameters are
  immutable pytrees; evaluation just runs the inner loop on theta.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gmeta_tpu.data.pack import TaskBatch
from gmeta_tpu.meta.protonet import proto_loss_spt, proto_loss_qry
from gmeta_tpu.models.gcn import forward, init_params, precompute


class InnerAux(NamedTuple):
    qry_accs: jnp.ndarray    # (num_steps + 1,) accuracy curve (corrects analog)
    qry_losses: jnp.ndarray  # (num_steps + 1,)
    spt_losses: jnp.ndarray  # (num_steps,)


def make_inner_loop(layer_spec: Sequence[Tuple[str, tuple]],
                    proto_classes: int, update_lr: float,
                    num_steps: int, first_order: bool = True,
                    compute_dtype=jnp.float32, remat: bool = False,
                    track_curve: bool = True, agg: str = "dense"):
    """Returns inner_loop(params, task: TaskBatch, feats) ->
    (meta_loss, InnerAux). meta_loss is the LAST-step query loss
    (meta.py:161); the accuracy curve has num_steps+1 entries with entry 0
    the pre-update evaluation (meta.py:129-134).

    track_curve=False skips the per-step query evaluations — they exist only
    to report the reference's per-step accuracy curve (meta.py:129-141,
    152-157); the meta-gradient depends only on the LAST step's query loss
    (meta.py:161). The returned curve then holds the final eval in every
    slot. ~2x faster when the query set dominates (k_qry >> k_spt)."""

    def inner_loop(params, task: TaskBatch, feats):
        # Adjacency + norm + the input-feature gather are constant across
        # inner steps: build them ONCE here (a scalar scatter + one gather),
        # so the scanned step body is pure MXU matmuls.
        dense_spt = precompute(task.spt, compute_dtype, feats=feats)
        dense_qry = precompute(task.qry, compute_dtype, feats=feats)

        def _spt(w):
            logits = forward(w, task.spt, feats, layer_spec,
                             dense=dense_spt, compute_dtype=compute_dtype,
                             agg=agg)
            loss, acc, protos = proto_loss_spt(
                logits, task.spt.labels, proto_classes)
            return loss, (acc, protos)

        def _qry(w, protos):
            logits = forward(w, task.qry, feats, layer_spec,
                             dense=dense_qry, compute_dtype=compute_dtype,
                             agg=agg)
            return proto_loss_qry(logits, task.qry.labels, protos)

        def step(w, _):
            (loss_s, (_, protos)), g = jax.value_and_grad(
                _spt, has_aux=True)(w)
            if first_order:
                g = jax.tree.map(jax.lax.stop_gradient, g)
            w = jax.tree.map(lambda p, gi: p - update_lr * gi, w, g)
            if track_curve:
                ql, qa = _qry(w, protos)
                return w, (ql, qa, loss_s)
            return w, (protos, loss_s)

        if remat:
            step = jax.checkpoint(step)

        if track_curve:
            # Step-0 evaluation: query loss/acc with theta and theta-derived
            # prototypes, under no_grad in the reference (meta.py:129-134).
            _, (_, protos0) = _spt(params)
            q0 = jax.lax.stop_gradient(_qry(params, protos0))
            _, (qls, qas, sls) = jax.lax.scan(
                step, params, None, length=num_steps)
            meta_loss = qls[-1]
            aux = InnerAux(
                qry_accs=jnp.concatenate([q0[1][None], qas]),
                qry_losses=jnp.concatenate([q0[0][None], qls]),
                spt_losses=sls,
            )
            return meta_loss, aux

        # Fast path: one query forward total, with the final fast weights and
        # the LAST step's support prototypes (the reference's ordering:
        # prototypes refreshed before the weight update, meta.py:143-151).
        w, (protos_all, sls) = jax.lax.scan(
            step, params, None, length=num_steps)
        protos = jax.tree.map(lambda p: p[-1], protos_all)
        meta_loss, q_acc = _qry(w, protos)
        ones = jnp.ones(num_steps + 1, dtype=jnp.float32)
        aux = InnerAux(qry_accs=q_acc * ones, qry_losses=meta_loss * ones,
                       spt_losses=sls)
        return meta_loss, aux

    return inner_loop


class MetaLearner:
    """Owns params + Adam state and the jitted train/eval steps.

    `mesh`/`task_sharding` (optional) shard the meta-batch's task axis across
    devices; parameters stay replicated and XLA inserts the psum of
    meta-gradients (the DP plan of SURVEY.md §2.3).
    """

    def __init__(self, layer_spec, proto_classes: int, *,
                 update_lr: float, meta_lr: float,
                 update_step: int, update_step_test: int,
                 first_order: bool = True, compute_dtype=jnp.float32,
                 remat: bool = False, seed: int = 222,
                 mesh=None, track_curve: bool = True, agg: str = "dense",
                 task_chunk: int = 0):
        self.layer_spec = layer_spec
        self.params = init_params(jax.random.PRNGKey(seed), layer_spec)
        self.tx = optax.adam(meta_lr)  # torch.optim.Adam defaults (meta.py:97)
        self.opt_state = self.tx.init(self.params)
        self.mesh = mesh
        # task_chunk > 0 bounds the per-step HBM workspace: the task vmap
        # becomes lax.map(batch_size=task_chunk), so only `task_chunk`
        # tasks' densified adjacencies are ever live at once (arxiv: 32
        # vmapped query sets = 32 x 72 x 1024^2 f32 = 9.7 GB; chunked at 8
        # that is 2.4 GB). Math is unchanged — lax.map stacks results like
        # vmap. Only meaningful without a mesh (a sequential map over a
        # sharded task axis would serialize the DP groups).
        assert not (task_chunk and mesh is not None), \
            "task_chunk is incompatible with a task-DP mesh"
        self.task_chunk = task_chunk

        def vmap_tasks(fn):
            def run(params, batch, feats):
                if task_chunk:
                    return jax.lax.map(lambda t: fn(params, t, feats),
                                       batch, batch_size=task_chunk)
                return jax.vmap(fn, in_axes=(None, 0, None))(
                    params, batch, feats)
            return run

        train_inner = make_inner_loop(
            layer_spec, proto_classes, update_lr, update_step,
            first_order=first_order, compute_dtype=compute_dtype, remat=remat,
            track_curve=track_curve, agg=agg)
        test_inner = make_inner_loop(
            layer_spec, proto_classes, update_lr, update_step_test,
            first_order=first_order, compute_dtype=compute_dtype, remat=remat,
            agg=agg)

        def meta_loss_fn(params, batch: TaskBatch, feats):
            losses, aux = vmap_tasks(train_inner)(params, batch, feats)
            return losses.mean(), aux

        def train_step(params, opt_state, batch, feats):
            (loss, aux), grads = jax.value_and_grad(
                meta_loss_fn, has_aux=True)(params, batch, feats)
            updates, new_opt_state = self.tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            # NaN skip guard (meta.py:163-169), counted not silent.
            ok = jnp.isfinite(loss)
            params = jax.tree.map(
                lambda n, o: jnp.where(ok, n, o), new_params, params)
            opt_state = jax.tree.map(
                lambda n, o: jnp.where(ok, n, o), new_opt_state, opt_state)
            # Mean accuracy curve over tasks (meta.py:171-173).
            accs = aux.qry_accs.mean(axis=0)
            metrics = {"meta_loss": loss, "accs": accs,
                       "nan_skip": (~ok).astype(jnp.int32)}
            return params, opt_state, metrics

        def finetune(params, task: TaskBatch, feats):
            # Single task, update_step_test steps; returns the accuracy curve
            # (len update_step_test+1, not averaged — meta.py:232-234).
            _, aux = test_inner(params, task, feats)
            return aux.qry_accs

        def finetune_batch(params, batch: TaskBatch, feats):
            # Vmapped eval over a batch of tasks -> (T, update_step_test+1)
            # accuracy curves. Replaces the reference's one-task-at-a-time
            # val/test DataLoader loop (train.py:115-121,129-134) with one
            # dispatch; the deepcopy there is unnecessary here since params
            # are immutable.
            _, aux = vmap_tasks(test_inner)(params, batch, feats)
            return aux.qry_accs

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as _P
            _task_shd = NamedSharding(mesh, _P("task"))

            def _constrain_tasks(batch):
                # DP over the gathered meta-batch: shard the leading task
                # axis across the mesh (GSPMD inserts the meta-gradient
                # psum), pool itself stays replicated.
                return jax.tree.map(
                    lambda x: jax.lax.with_sharding_constraint(x, _task_shd),
                    batch)
        else:
            def _constrain_tasks(batch):
                return batch

        def train_step_pool(params, opt_state, pool, idxs, feats):
            # Gather the meta-batch from the device-resident task pool inside
            # jit: per-step host->device traffic is just `idxs` (bytes), the
            # TPU-native replacement for re-shipping packed batches each step.
            batch = _constrain_tasks(jax.tree.map(lambda x: x[idxs], pool))
            return train_step(params, opt_state, batch, feats)

        def train_many_pool(params, opt_state, pool, idx_mat, feats):
            # K meta-steps per dispatch: lax.scan over the K gathered
            # meta-batches, params/opt-state carried on device. Amortizes
            # dispatch latency (the tunnel round-trip dominates small steps)
            # to ~0. The pool gather happens ONCE, OUTSIDE the loop: a
            # pool[idxs] inside the scan body makes XLA carry the pool
            # through the while-loop and materialize full-pool temp copies
            # (measured: a 3.5 GB ToL pool compiled to 23 GB HBM and OOMed);
            # gathered-outside, the loop only carries the (K, T, ...) window.
            K, T = idx_mat.shape
            batches = jax.tree.map(
                lambda x: x[idx_mat.reshape(-1)].reshape(
                    (K, T) + x.shape[1:]), pool)

            def body(carry, batch):
                p, o = carry
                p, o, metrics = train_step(p, o, _constrain_tasks(batch),
                                           feats)
                return (p, o), metrics
            (params, opt_state), ms = jax.lax.scan(
                body, (params, opt_state), batches)
            return params, opt_state, ms

        def train_many_compact(params, opt_state, cpool, idx_mat, feats):
            # HBM-resident pool in COMPACT form (no masks, packed edge
            # endpoints — ~2.5x smaller than the full packed pool), decoded
            # per window by one gather + integer unpacking. The gather runs
            # OUTSIDE the scan (see train_many_pool), so the pool is never
            # carried through the while-loop. Per-step host->device traffic:
            # the (K, T) index matrix.
            K, T = idx_mat.shape
            flat = idx_mat.reshape(-1)

            def dec(leaves, meta):
                g = [l[flat].reshape((K, T) + l.shape[1:]) for l in leaves]
                return self._build_set(g, meta, (K, T))

            batches = TaskBatch(spt=dec(cpool[0], self._cmeta[0]),
                                qry=dec(cpool[1], self._cmeta[1]))

            def body(carry, batch):
                p, o = carry
                p, o, metrics = train_step(p, o, _constrain_tasks(batch),
                                           feats)
                return (p, o), metrics
            (params, opt_state), ms = jax.lax.scan(
                body, (params, opt_state), batches)
            return params, opt_state, ms

        def train_many_seq(params, opt_state, buf, feats):
            # Windowed host-pool fast path: the window arrives as ONE
            # contiguous int32 buffer (see put_window_buffer) — a single
            # tunnel transfer instead of one per pytree leaf, which is what
            # the ~30 MB/s-effective tunnel makes of per-leaf device_puts.
            # Decode (static slices + bitcasts, HBM-speed) then scan the K
            # meta-batches directly; no pool, no gather.
            batches = self._decode_window(buf)
            def body(carry, batch):
                p, o = carry
                p, o, metrics = train_step(p, o, _constrain_tasks(batch),
                                           feats)
                return (p, o), metrics
            (params, opt_state), ms = jax.lax.scan(
                body, (params, opt_state), batches)
            return params, opt_state, ms

        if mesh is not None:
            from gmeta_tpu.parallel.dp import shard_train_step
            self._train_step = shard_train_step(train_step, mesh)
            self._finetune = jax.jit(finetune)
        else:
            self._train_step = jax.jit(train_step)
            self._finetune = jax.jit(finetune)
        self._train_step_pool = jax.jit(train_step_pool)
        self._train_many_pool = jax.jit(train_many_pool)
        self._train_many_seq = jax.jit(train_many_seq)
        self._train_many_compact = jax.jit(train_many_compact)
        self._finetune_batch = jax.jit(finetune_batch)

        self._feats = None
        self._pool = None
        self._codec = None   # window wire codec (K, T, spt_meta, qry_meta)
        self._cpool = None   # compact device-resident pool leaves
        self._cmeta = None   # (spt_meta, qry_meta) for the compact pool

    # -- host-facing API -----------------------------------------------------

    def set_features(self, feats: np.ndarray):
        self._feats = jax.device_put(jnp.asarray(feats, dtype=jnp.float32))

    def set_task_pool(self, pool: TaskBatch):
        """Place a stacked task pool (leading axis = number of tasks) in
        device HBM once; subsequent train_step_from_pool calls transfer only
        task indices. With a mesh, the pool is replicated across devices and
        each gathered meta-batch is sharded over the 'task' axis."""
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(self.mesh, P())
            self._pool = jax.tree.map(
                lambda x: jax.device_put(jnp.asarray(x), rep), pool)
        else:
            self._pool = jax.tree.map(
                lambda x: jax.device_put(jnp.asarray(x)), pool)

    def train_step_from_pool(self, idxs):
        idxs = jnp.asarray(idxs, dtype=jnp.int32)
        self.params, self.opt_state, metrics = self._train_step_pool(
            self.params, self.opt_state, self._pool, idxs, self._feats)
        return metrics

    def train_steps_from_pool(self, idx_mat):
        """Run idx_mat.shape[0] meta-steps in ONE dispatch (scan on device).
        Returns stacked per-step metrics (leading axis = steps)."""
        idx_mat = jnp.asarray(idx_mat, dtype=jnp.int32)
        self.params, self.opt_state, metrics = self._train_many_pool(
            self.params, self.opt_state, self._pool, idx_mat, self._feats)
        return metrics

    # -- window wire format ----------------------------------------------
    #
    # The host-pool path ships packed windows through the TPU tunnel, whose
    # effective throughput (~30 MB/s measured) makes wire bytes the
    # production bottleneck. Three reductions, all lossless:
    #   1. ONE contiguous int32 buffer per window (one transfer, not one
    #      per pytree leaf).
    #   2. masks are never shipped: pack_set places live node rows at
    #      [0, bin_fill) and real edges at [0, n_edges), so node_mask =
    #      iota < bin_fill and edge_mask = iota < n_edges, reconstructed
    #      on device for free.
    #   3. edge endpoints pack into ONE int32. Edges never cross bins (the
    #      packed adjacency is block-diagonal, pack.py), so (bin,
    #      src_local, dst_local) pins both flat endpoints; it fits whenever
    #      2*ceil(log2 P) + ceil(log2 B) <= 31 — true for every recipe's
    #      buckets (P <= 1024, B <= 72). Halves edge bytes (the dominant
    #      term). Pad slots (mask 0 downstream) get src := dst's bin base,
    #      which keeps decoded indices in-range.

    @staticmethod
    def _edge_bits(B: int, P: int):
        bits_p = max(int(np.ceil(np.log2(max(P, 2)))), 1)
        bits_b = max(int(np.ceil(np.log2(max(B, 2)))), 1)
        return (bits_p if 2 * bits_p + bits_b <= 31 else 0)

    def _encode_set(self, sg, K, T, parts, shapes):
        B, P = sg.node_gid.shape[-2:]
        E = sg.edge_src.shape[-1]
        bits_p = self._edge_bits(B, P)
        n_edges = sg.edge_mask.reshape(K * T, E).sum(axis=1).astype(np.int32)
        parts.append(np.ascontiguousarray(sg.node_gid).ravel())
        if bits_p:
            dst = sg.edge_dst.astype(np.int32)
            bin_id = dst // P
            dst_l = dst - bin_id * P
            # real edges share the dst's bin; pad edges (src=0, dst=V-1)
            # don't — clip is exact for real edges, in-range for pads
            src_l = np.clip(sg.edge_src.astype(np.int32) - bin_id * P,
                            0, P - 1)
            packed = src_l | (dst_l << bits_p) | (bin_id << (2 * bits_p))
            parts.append(np.ascontiguousarray(packed).ravel())
        else:
            parts.append(np.ascontiguousarray(sg.edge_src).ravel())
            parts.append(np.ascontiguousarray(sg.edge_dst).ravel())
        parts.append(np.ascontiguousarray(sg.centers).ravel())
        parts.append(np.ascontiguousarray(sg.labels).ravel())
        parts.append(np.ascontiguousarray(sg.bin_fill).ravel())
        parts.append(n_edges)
        S = sg.centers.shape[-2]
        shapes.append((B, P, E, S, bits_p))

    @staticmethod
    def _build_set(leaves, meta, lead):
        """Compact leaves (node_gid, edges..., centers, labels, bin_fill,
        n_edges) with leading dims `lead` -> full SubgraphSet: unpack edge
        endpoints, reconstruct both masks."""
        from gmeta_tpu.data.pack import SubgraphSet
        B, P, E, S, bits_p = meta
        it = iter(leaves)
        node_gid = next(it)
        if bits_p:
            packed = next(it)
            mask_p = (1 << bits_p) - 1
            base = (packed >> (2 * bits_p)) * P     # bin * P, non-negative
            edge_src = base + (packed & mask_p)
            edge_dst = base + ((packed >> bits_p) & mask_p)
        else:
            edge_src, edge_dst = next(it), next(it)
        centers, labels, bin_fill, n_edges = it
        nd = len(lead)
        node_mask = (jax.lax.broadcasted_iota(
            jnp.int32, lead + (B, P), nd + 1)
            < bin_fill[..., None]).astype(jnp.float32)
        edge_mask = (jax.lax.broadcasted_iota(jnp.int32, lead + (E,), nd)
                     < n_edges[..., None]).astype(jnp.float32)
        return SubgraphSet(node_gid=node_gid, node_mask=node_mask,
                           edge_src=edge_src, edge_dst=edge_dst,
                           edge_mask=edge_mask, centers=centers,
                           labels=labels, bin_fill=bin_fill)

    def _decode_set(self, buf, off, K, T, meta):
        B, P, E, S, bits_p = meta

        def take(n, shape):
            nonlocal off
            x = buf[off:off + n]
            off += n
            return x.reshape((K, T) + shape)

        leaves = [take(K * T * B * P, (B, P))]
        if bits_p:
            leaves.append(take(K * T * E, (E,)))
        else:
            leaves.append(take(K * T * E, (E,)))
            leaves.append(take(K * T * E, (E,)))
        leaves += [take(K * T * S * 2, (S, 2)), take(K * T * S, (S,)),
                   take(K * T * B, (B,)), take(K * T, ())]
        return self._build_set(leaves, meta, (K, T)), off

    def _decode_window(self, buf):
        """Traced: flat int32 window buffer -> (K, task_num, ...) TaskBatch.
        Static slices + integer unpacking + mask reconstruction — all
        HBM-speed on device."""
        K, T, spt_meta, qry_meta = self._codec
        spt, off = self._decode_set(buf, 0, K, T, spt_meta)
        qry, off = self._decode_set(buf, off, K, T, qry_meta)
        return TaskBatch(spt=spt, qry=qry)

    def _encode_set_leaves(self, sg):
        """Host: SubgraphSet with leading task axis -> (compact leaves,
        meta). Same format as the window wire, kept as separate (N, ...)
        arrays for device-side gathering."""
        B, P = sg.node_gid.shape[-2:]
        E = sg.edge_src.shape[-1]
        bits_p = self._edge_bits(B, P)
        n_edges = sg.edge_mask.sum(axis=-1).astype(np.int32)
        leaves = [np.ascontiguousarray(sg.node_gid)]
        if bits_p:
            dst = sg.edge_dst.astype(np.int32)
            bin_id = dst // P
            src_l = np.clip(sg.edge_src.astype(np.int32) - bin_id * P,
                            0, P - 1)
            leaves.append(src_l | ((dst - bin_id * P) << bits_p)
                          | (bin_id << (2 * bits_p)))
        else:
            leaves.append(np.ascontiguousarray(sg.edge_src))
            leaves.append(np.ascontiguousarray(sg.edge_dst))
        leaves += [np.ascontiguousarray(sg.centers),
                   np.ascontiguousarray(sg.labels),
                   np.ascontiguousarray(sg.bin_fill), n_edges]
        S = sg.centers.shape[-2]
        return [np.asarray(l, np.int32) for l in leaves], (B, P, E, S, bits_p)

    @staticmethod
    def compact_pool_bytes(pool: TaskBatch) -> int:
        """Compact-form size of a stacked pool, without encoding it."""
        def one(sg):
            N, B, P = sg.node_gid.shape
            E = sg.edge_src.shape[-1]
            S = sg.centers.shape[-2]
            edge_words = E if MetaLearner._edge_bits(B, P) else 2 * E
            return N * 4 * (B * P + edge_words + 3 * S + B + 1)
        return one(pool.spt) + one(pool.qry)

    def set_task_pool_compact(self, pool: TaskBatch):
        """Place the pool in HBM in compact form (~2.5x smaller than the
        full packed pool: no masks, single-int32 edge endpoints). Train
        windows then gather+decode on device; steady-state host->device
        traffic is the index matrix only."""
        spt_leaves, m_spt = self._encode_set_leaves(pool.spt)
        qry_leaves, m_qry = self._encode_set_leaves(pool.qry)
        self._cmeta = (m_spt, m_qry)
        self._cpool = (
            tuple(jax.device_put(jnp.asarray(l)) for l in spt_leaves),
            tuple(jax.device_put(jnp.asarray(l)) for l in qry_leaves))

    def train_steps_from_compact(self, idx_mat):
        """idx_mat.shape[0] meta-steps in one dispatch over the compact
        device-resident pool."""
        idx_mat = jnp.asarray(np.asarray(idx_mat), dtype=jnp.int32)
        self.params, self.opt_state, metrics = self._train_many_compact(
            self.params, self.opt_state, self._cpool, idx_mat, self._feats)
        return metrics

    def encode_window(self, chunk: TaskBatch, task_num: int):
        """Host-side: (K*task_num)-task window chunk -> (flat int32 buffer,
        codec). Pure numpy — safe to run on a producer thread so the
        gather+encode work overlaps device transfer AND compute."""
        K = chunk.spt.node_gid.shape[0] // task_num
        T = task_num
        parts, shapes = [], []
        self._encode_set(chunk.spt, K, T, parts, shapes)
        self._encode_set(chunk.qry, K, T, parts, shapes)
        buf = np.concatenate([p.astype(np.int32, copy=False) for p in parts])
        return buf, (K, T, shapes[0], shapes[1])

    def put_buffer(self, buf: np.ndarray, codec):
        """Async host->device transfer of an encoded window buffer."""
        self._codec = codec
        return jax.device_put(jnp.asarray(buf))

    def put_window(self, chunk: TaskBatch, task_num: int):
        """encode_window + put_buffer in one call (inline path)."""
        return self.put_buffer(*self.encode_window(chunk, task_num))

    def train_steps_from_window(self, buf_dev, task_num: int):
        """K meta-steps in one dispatch over an already-shipped window
        buffer (put_window)."""
        self.params, self.opt_state, metrics = self._train_many_seq(
            self.params, self.opt_state, buf_dev, self._feats)
        return metrics

    def train_step(self, batch: TaskBatch):
        if self.mesh is not None:
            from gmeta_tpu.parallel.dp import shard_batch
            batch = shard_batch(batch, self.mesh)
        self.params, self.opt_state, metrics = self._train_step(
            self.params, self.opt_state, batch, self._feats)
        return metrics

    def finetune(self, task: TaskBatch) -> jnp.ndarray:
        return self._finetune(self.params, task, self._feats)

    def finetune_with(self, params, task: TaskBatch) -> jnp.ndarray:
        """Finetune from an explicit parameter snapshot (best-model eval,
        train.py:139-141)."""
        return self._finetune(params, task, self._feats)

    def finetune_batch(self, batch: TaskBatch, params=None) -> jnp.ndarray:
        """(T, update_step_test+1) accuracy curves for a batch of tasks."""
        p = self.params if params is None else params
        return self._finetune_batch(p, batch, self._feats)

    def snapshot(self):
        """Copy of current params (the reference's deepcopy early-stopping
        snapshot, train.py:127 — here just a reference; pytrees are immutable)."""
        return self.params
