"""Training driver: the reference's full protocol, TPU-native.

Replicates G-Meta/train.py:86-148 semantics — per-epoch train loop over
task_num-sized meta-batches, per-epoch validation with early-stopping
snapshot of the best model (val acc at the LAST finetune step,
train.py:123-127), final test of both the last and the best model — with
the systems layers the reference lacks: structured jsonl metrics,
checkpoint/resume, vmapped batched evaluation, and optional task-DP mesh
sharding.

Reporting parity notes (SURVEY.md §6 caveats): the reference prints
`accs[1]` as "Test acc" (train.py:137) and its "Early Stopped Test acc"
averages a list contaminated by the previous test loop (train.py:130-146).
Both reference-style numbers are reported alongside the clean ones.

CLI: python -m gmeta_tpu.run.train --preset arxiv --data_dir ... [overrides]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import queue
import threading
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gmeta_tpu.config import Config, PRESETS, build_model_config
from gmeta_tpu.data.pipeline import MetaDataset
from gmeta_tpu.meta.maml import MetaLearner
from gmeta_tpu.models.gcn import count_params
from gmeta_tpu.utils import checkpoint as ckpt
from gmeta_tpu.utils.metrics import MetricLogger, StepTimer, rss_gb


@dataclasses.dataclass
class FitResult:
    test_acc_ref: float            # reference-style: mean accs[1], last model
    test_acc_final: float          # clean: mean accs[-1], last model
    best_test_acc: float           # clean: mean accs[-1], best model
    early_stopped_ref: float       # reference-style contaminated average
    val_max_acc: float
    epochs_run: int                # epochs executed THIS process (resume-aware)
    global_step: int


class Trainer:
    def __init__(self, cfg: Config, store, datasets: Dict[str, MetaDataset],
                 labels_num: int, mesh=None, metrics: Optional[MetricLogger] = None):
        self.cfg = cfg
        self.store = store
        self.datasets = datasets
        self.mesh = mesh
        if cfg.debug_nans:
            jax.config.update("jax_debug_nans", True)
        self.metrics = metrics or MetricLogger(cfg.metrics_path)
        self.spec = build_model_config(cfg, store.feat_dim, labels_num)
        compute_dtype = (jnp.bfloat16 if cfg.dtype == "bfloat16"
                         else jnp.float32)
        agg = cfg.agg
        if agg == "auto":
            agg = datasets["train"].suggested_agg
            self.metrics.echo_line(
                f"agg kernel: {agg} (bin fill "
                f"{datasets['train'].mean_bin_fill:.2f})")
        # Which kernel ran + the compiled bucket shapes, in the metric
        # stream — perf regressions must be attributable (SURVEY.md §5.5).
        self.agg = agg
        tr = datasets["train"]
        self.buckets = dict(P_spt=tr.P_spt, B_spt=tr.B_spt, E_spt=tr.E_spt,
                            P_qry=tr.P_qry, B_qry=tr.B_qry, E_qry=tr.E_qry)
        # task-vmap chunking: bound the live densified adjacencies
        # (chunk * (B_spt*P_spt^2 + B_qry*P_qry^2) * 4B) to ~2.5 GB —
        # without it an arxiv-shape 32-task vmap holds 10+ GB of query A
        task_chunk = cfg.task_vmap_chunk
        a_bytes = 4 * (tr.B_spt * tr.P_spt ** 2 + tr.B_qry * tr.P_qry ** 2)
        if task_chunk < 0 and mesh is None:
            # 0.6 GB of live A per chunk: XLA double-buffers the chunk's
            # adjacency (measured arxiv compile held 2 copies), so the real
            # footprint is ~2x this; 2.5e9 here OOMed next to a resident pool
            fit = max(1, int(6e8 // max(a_bytes, 1)))
            task_chunk = 0 if fit >= cfg.task_num else fit
        elif task_chunk < 0 or mesh is not None:
            task_chunk = 0
        if task_chunk:
            self.metrics.echo_line(f"task vmap chunked at {task_chunk}"
                                   f" (per-task A = {a_bytes/1e6:.0f} MB)")
        self.metrics.log("run_config", agg=agg,
                         mean_bin_fill=round(tr.mean_bin_fill, 4),
                         device_task_pool=cfg.device_task_pool,
                         task_chunk=task_chunk,
                         **self.buckets)
        self.learner = MetaLearner(
            self.spec, labels_num,
            update_lr=cfg.update_lr, meta_lr=cfg.meta_lr,
            update_step=cfg.update_step, update_step_test=cfg.update_step_test,
            first_order=cfg.first_order, compute_dtype=compute_dtype,
            remat=cfg.remat_inner, seed=cfg.seed, mesh=mesh,
            track_curve=cfg.track_train_curve, agg=agg,
            task_chunk=task_chunk)
        self.learner.set_features(store.features)
        self.metrics.echo_line(
            f"Total trainable tensors: {count_params(self.learner.params)}")

        # early stopping state (train.py:86-87,125-127)
        self.max_acc = 0.0
        self.best_params = self.learner.params
        self.start_epoch = 0
        self.start_batch = 0   # in-epoch batch position (mid-epoch resume)
        self.global_step = 0

        if cfg.checkpoint_dir:
            path = ckpt.latest_path(cfg.checkpoint_dir)
            if path:
                self._restore(path)

    # ---- checkpointing -----------------------------------------------------

    def _restore(self, path: str):
        state = ckpt.restore(path)
        self.learner.params = tuple(jnp.asarray(p) for p in state["params"])
        self.learner.opt_state = jax.tree.map(
            jnp.asarray, state["opt_state"],
            is_leaf=lambda x: isinstance(x, np.ndarray))
        self.max_acc = float(state["max_acc"])
        self.best_params = tuple(jnp.asarray(p) for p in state["best_params"])
        self.global_step = int(state["step"])
        batch_in_epoch = int(state.get("batch_in_epoch", -1))
        if batch_in_epoch >= 0:
            # mid-epoch snapshot: re-enter the SAME epoch and skip the batches
            # already consumed (the stream order is a pure function of
            # seed + epoch, so position alone pins the remaining stream)
            self.start_epoch = int(state["epoch"])
            self.start_batch = batch_in_epoch
        else:
            self.start_epoch = int(state["epoch"]) + 1
            self.start_batch = 0
        self.metrics.echo_line(
            f"resumed from {path} at epoch {self.start_epoch}"
            f" batch {self.start_batch}")

    def _save(self, epoch: int, batch_in_epoch: int = -1,
              params=None, opt_state=None):
        """batch_in_epoch >= 0 marks a mid-epoch snapshot: `batch_in_epoch`
        batches of this epoch are already consumed; -1 = epoch complete.
        `params`/`opt_state` override the learner's CURRENT handles — needed
        by pipelined loops where the learner already holds the NEXT window's
        dispatched state when the snapshot point is consumed."""
        if not self.cfg.checkpoint_dir:
            return
        ckpt.save(self.cfg.checkpoint_dir, self.global_step, {
            "params": self.learner.params if params is None else params,
            "opt_state": (self.learner.opt_state if opt_state is None
                          else opt_state),
            "best_params": self.best_params,
            "max_acc": self.max_acc,
            "epoch": epoch,
            "batch_in_epoch": batch_in_epoch,
            "step": self.global_step,
        })

    # ---- evaluation --------------------------------------------------------

    def evaluate(self, split: str, params=None) -> np.ndarray:
        """Mean accuracy curve (update_step_test+1,) over a split's tasks,
        evaluated in vmapped chunks (reference: one-at-a-time DataLoader,
        train.py:115-121). The ragged last chunk is padded to the full chunk
        size (repeating tasks) and the padded rows dropped, so ONE program
        shape covers the whole split — no recompile on the remainder."""
        ds = self.datasets[split]
        chunk = max(1, self.cfg.task_num)
        curves = []
        for batch in ds.batches(chunk, shuffle=False, drop_last=False,
                                pad_last=True):
            accs = self.learner.finetune_batch(batch, params=params)
            curves.append(np.asarray(accs))
        return np.concatenate(curves, axis=0)[:len(ds)]

    # ---- training ----------------------------------------------------------

    def fit(self) -> FitResult:
        cfg = self.cfg
        train = self.datasets["train"]
        t_start = time.time()
        # jax.profiler tracing window (SURVEY.md §5.1): starts after the first
        # step (compile excluded), covers cfg.profile_steps device steps.
        prof_stop = (self.global_step + 1 + cfg.profile_steps
                     if cfg.profile_dir else -1)
        prof_active = False

        mean_edges = train.mean_edges_per_task
        win_t, win_steps = time.time(), 0
        self._fit_from_epoch = self.start_epoch  # for epochs_run on resume

        if cfg.device_task_pool:
            return self._fit_device_pool(t_start, mean_edges)

        # Depth-1 dispatch pipeline: packing batch N+1 overlaps the device
        # executing step N, but step N+1 is not dispatched until step N has
        # completed. Without this bound the host can run up to
        # train_result_report_steps dispatches ahead (the only sync was the
        # report-step accs fetch) — ~200 staged batches = tens of GB of host
        # transfer buffers, which drove the machine to the edge of OOM when
        # the TPU tunnel briefly stalled mid-epoch during the round-3 arxiv
        # parity run. Costs nothing in steady state: one step of overlap is
        # exactly what the pack/compute pipeline needs.
        prev_handle = None
        for epoch in range(self.start_epoch, cfg.epoch):
            timer = StepTimer()
            skip = self.start_batch if epoch == self.start_epoch else 0
            for step, batch in enumerate(train.batches(
                    cfg.task_num, shuffle=True, seed=cfg.seed + epoch,
                    num_workers=cfg.num_workers, skip_batches=skip),
                    start=skip):
                data_t = timer.split()
                if prof_stop >= 0 and not prof_active \
                        and self.global_step == prof_stop - cfg.profile_steps:
                    jax.profiler.start_trace(cfg.profile_dir)
                    prof_active = True
                if prev_handle is not None:
                    jax.block_until_ready(prev_handle)
                m = self.learner.train_step(batch)
                prev_handle = m["meta_loss"]
                if prof_active and self.global_step + 1 >= prof_stop:
                    jax.block_until_ready(m["meta_loss"])
                    jax.profiler.stop_trace()
                    prof_active = False
                    self.metrics.echo_line(
                        f"profiler trace written to {cfg.profile_dir}")
                win_steps += 1
                if step % cfg.train_result_report_steps == 0:
                    accs = np.asarray(m["accs"])  # sync point (host fetch)
                    compute_t = timer.split()
                    # window throughput: tasks (and their real edges) per
                    # wall-second since the previous report (north-star
                    # metrics, SURVEY.md §5.5)
                    dt = max(time.time() - win_t, 1e-9)
                    tasks_per_s = win_steps * cfg.task_num / dt
                    win_t, win_steps = time.time(), 0
                    self.metrics.echo_line(
                        f"Epoch: {epoch + 1}  Step: {step}  training acc: "
                        f"{accs[-1]:.3f}  time elapsed: {compute_t:.3f}  "
                        f"data loading takes: {data_t:.3f}  Memory usage: "
                        f"{rss_gb():.1f}")
                    self.metrics.log(
                        "train_step", epoch=epoch, step=self.global_step,
                        acc_curve=accs.tolist(),
                        meta_loss=float(m["meta_loss"]),
                        nan_skip=int(m["nan_skip"]),
                        tasks_per_s=round(tasks_per_s, 2),
                        edges_per_s=round(tasks_per_s * mean_edges, 1),
                        data_s=data_t, compute_s=compute_t, rss_gb=rss_gb())
                self.global_step += 1
                if (cfg.checkpoint_every_steps
                        and self.global_step % cfg.checkpoint_every_steps == 0):
                    self._save(epoch, batch_in_epoch=step + 1)

            # per-epoch validation + early stopping (train.py:115-127)
            curves = self.evaluate("val")
            acc_curve = curves.mean(axis=0)
            self.metrics.echo_line(
                f"Epoch: {epoch + 1}  Val acc: {acc_curve[-1]:.3f}")
            self.metrics.log("val", epoch=epoch, step=self.global_step,
                             acc_curve=acc_curve.tolist())
            if acc_curve[-1] > self.max_acc:
                self.max_acc = float(acc_curve[-1])
                self.best_params = self.learner.params
            if (epoch + 1) % cfg.checkpoint_every_epochs == 0:
                self._save(epoch)

        if prof_active:  # fewer total steps than the requested trace window
            jax.profiler.stop_trace()

        return self._final_test(t_start)

    def _fit_device_pool(self, t_start: float, mean_edges: float) -> "FitResult":
        """Epoch loop with the train pool resident in HBM: the epoch's
        shuffled task stream is chunked into report windows, each window
        running as ONE dispatch (lax.scan over meta-steps on device). The
        protocol (per-epoch val, early stopping, checkpointing, final tests)
        is identical to the streaming path.

        Compact pools above cfg.compact_pool_hbm_gb (arxiv: 10,000 tasks x
        ~1 MB compact = ~9.5 GB vs 16 GB of v5e HBM just fits; ToL's 5,000
        larger tasks do not) switch to the host-resident windowed variant
        (_fit_host_pool)."""
        cfg = self.cfg
        train = self.datasets["train"]
        pool_np = train.stacked_pool()
        compact_gb = MetaLearner.compact_pool_bytes(pool_np) / 1e9
        if compact_gb <= cfg.compact_pool_hbm_gb:
            self.metrics.echo_line(
                f"compact task pool resident in HBM ({compact_gb:.1f} GB)")
            self.learner.set_task_pool_compact(pool_np)
            step_fn = self.learner.train_steps_from_compact
        else:
            self.metrics.echo_line(
                f"compact pool {compact_gb:.1f} GB >"
                f" compact_pool_hbm_gb={cfg.compact_pool_hbm_gb}"
                f" -> host-resident windowed pool"
                f" ({cfg.host_pool_window}-step windows)")
            return self._fit_host_pool(pool_np, t_start, mean_edges)
        # The scan gathers+decodes its whole window's batches up front
        # (gather-outside-loop, see train_many_compact), so the window must
        # be byte-bounded: K * task_num * full-form task bytes <= ~1 GB,
        # not the 200-step report cadence (arxiv: 200 x 32 x 2.4 MB would
        # be 15 GB of decoded windows next to the 9.5 GB pool).
        task_bytes = (sum(a.nbytes for a in jax.tree.leaves(pool_np))
                      / max(len(train), 1))
        byte_cap = max(1, int(5e8 // max(task_bytes * cfg.task_num, 1)))
        del pool_np
        n_tasks = len(train)
        steps_per_epoch = n_tasks // cfg.task_num
        window = max(1, min(cfg.train_result_report_steps, steps_per_epoch,
                            byte_cap))
        # profiler window: trace the second dispatched chunk (first includes
        # compile), mirroring the streaming path's post-compile trace
        prof_chunk = 1 if cfg.profile_dir else -1
        chunks_done = 0

        steps_since_save = 0
        for epoch in range(self.start_epoch, cfg.epoch):
            rng = np.random.RandomState(cfg.seed + epoch)
            order = rng.permutation(n_tasks)[:steps_per_epoch * cfg.task_num]
            idx_mat = order.reshape(steps_per_epoch, cfg.task_num)
            win_t = time.time()
            # Mid-epoch resume: the epoch's step stream is a pure function of
            # (seed, epoch), so skipping the consumed steps reproduces the
            # remaining stream. Params depend only on the per-step sequence,
            # not on how it is chunked into scan windows, so a resumed run's
            # shifted window boundaries change nothing.
            skip = self.start_batch if epoch == self.start_epoch else 0
            for start in range(skip, steps_per_epoch, window):
                chunk = idx_mat[start:start + window]
                if chunks_done == prof_chunk:
                    jax.profiler.start_trace(cfg.profile_dir)
                m = step_fn(chunk)
                accs = np.asarray(m["accs"])[-1]  # sync point
                if chunks_done == prof_chunk:
                    jax.profiler.stop_trace()
                    self.metrics.echo_line(
                        f"profiler trace written to {cfg.profile_dir}")
                chunks_done += 1
                dt = max(time.time() - win_t, 1e-9)
                win_t = time.time()
                tasks_per_s = chunk.shape[0] * cfg.task_num / dt
                self.global_step += int(chunk.shape[0])
                self.metrics.echo_line(
                    f"Epoch: {epoch + 1}  Step: {start + chunk.shape[0]}  "
                    f"training acc: {accs[-1]:.3f}  tasks/s: {tasks_per_s:.1f}")
                self.metrics.log(
                    "train_window", epoch=epoch, step=self.global_step,
                    acc_curve=accs.tolist(),
                    meta_loss=float(np.asarray(m["meta_loss"])[-1]),
                    nan_skip=int(np.asarray(m["nan_skip"]).sum()),
                    tasks_per_s=round(tasks_per_s, 2),
                    edges_per_s=round(tasks_per_s * mean_edges, 1),
                    rss_gb=rss_gb())
                steps_since_save += int(chunk.shape[0])
                if (cfg.checkpoint_every_steps
                        and steps_since_save >= cfg.checkpoint_every_steps):
                    # window-granular mid-epoch snapshot: `start + rows`
                    # steps of this epoch are consumed
                    self._save(epoch, batch_in_epoch=start + int(chunk.shape[0]))
                    steps_since_save = 0

            curves = self.evaluate("val")
            acc_curve = curves.mean(axis=0)
            self.metrics.echo_line(
                f"Epoch: {epoch + 1}  Val acc: {acc_curve[-1]:.3f}")
            self.metrics.log("val", epoch=epoch, step=self.global_step,
                             acc_curve=acc_curve.tolist())
            if acc_curve[-1] > self.max_acc:
                self.max_acc = float(acc_curve[-1])
                self.best_params = self.learner.params
            if (epoch + 1) % cfg.checkpoint_every_epochs == 0:
                self._save(epoch)

        return self._final_test(t_start)

    def _fit_host_pool(self, pool_np, t_start: float,
                       mean_edges: float) -> "FitResult":
        """Windowed host-resident pool: the packed pool lives in host RAM;
        each K = cfg.host_pool_window meta-steps run as one device scan over
        a window chunk shipped by an ASYNC device_put. The metric fetch for
        window N-1 happens after window N's transfer+compute are enqueued,
        so the host gather + transfer of a window overlap the previous
        window's device execution (depth-1 pipeline, like the streaming
        path — but with zero per-step packing and K-step dispatch
        amortization)."""
        cfg = self.cfg
        train = self.datasets["train"]
        n_tasks = len(train)
        steps_per_epoch = n_tasks // cfg.task_num
        window = max(1, min(cfg.host_pool_window, steps_per_epoch))

        def gather(rows):
            flat = rows.reshape(-1)
            return jax.tree.map(lambda x: x[flat], pool_np)

        steps_since_save = 0
        for epoch in range(self.start_epoch, cfg.epoch):
            rng = np.random.RandomState(cfg.seed + epoch)
            order = rng.permutation(n_tasks)[:steps_per_epoch * cfg.task_num]
            idx_mat = order.reshape(steps_per_epoch, cfg.task_num)
            win_t = time.time()
            skip = self.start_batch if epoch == self.start_epoch else 0
            pending = None   # (start, n_steps, metrics, params, opt_state)

            def consume(p, epoch=epoch):
                nonlocal win_t, steps_since_save
                start, n_steps, m, params_h, opt_h = p
                accs = np.asarray(m["accs"])[-1]       # blocks on window
                dt = max(time.time() - win_t, 1e-9)
                win_t = time.time()
                tasks_per_s = n_steps * cfg.task_num / dt
                self.global_step += n_steps
                self.metrics.echo_line(
                    f"Epoch: {epoch + 1}  Step: {start + n_steps}  training"
                    f" acc: {accs[-1]:.3f}  tasks/s: {tasks_per_s:.1f}")
                self.metrics.log(
                    "train_window", epoch=epoch, step=self.global_step,
                    acc_curve=accs.tolist(),
                    meta_loss=float(np.asarray(m["meta_loss"])[-1]),
                    nan_skip=int(np.asarray(m["nan_skip"]).sum()),
                    tasks_per_s=round(tasks_per_s, 2),
                    edges_per_s=round(tasks_per_s * mean_edges, 1),
                    rss_gb=rss_gb())
                steps_since_save += n_steps
                if (cfg.checkpoint_every_steps
                        and steps_since_save >= cfg.checkpoint_every_steps):
                    # params_h/opt_h are THIS window's post-step handles; the
                    # learner may already hold the next window's
                    self._save(epoch, batch_in_epoch=start + n_steps,
                               params=params_h, opt_state=opt_h)
                    steps_since_save = 0

            # Producer thread prepares window buffers (pool gather + wire
            # encode, pure numpy) ahead of the main thread's dispatch loop,
            # so host encode overlaps BOTH the previous window's transfer
            # and its compute. Queue depth 2 bounds staged memory.
            starts = list(range(skip, steps_per_epoch, window))
            q: "queue.Queue" = queue.Queue(maxsize=2)

            def produce():
                try:
                    for start in starts:
                        rows = idx_mat[start:start + window]
                        buf, codec = self.learner.encode_window(
                            gather(rows), cfg.task_num)
                        q.put((start, int(rows.shape[0]), buf, codec))
                    q.put(None)
                except BaseException as e:  # noqa: BLE001 — re-raised below
                    q.put(e)

            th = threading.Thread(target=produce, daemon=True)
            th.start()
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                start, n_steps, buf, codec = item
                dev = self.learner.put_buffer(buf, codec)           # async
                m = self.learner.train_steps_from_window(
                    dev, cfg.task_num)                              # async
                if pending is not None:
                    consume(pending)
                pending = (start, n_steps, m,
                           self.learner.params, self.learner.opt_state)
            if pending is not None:
                consume(pending)
            th.join()

            curves = self.evaluate("val")
            acc_curve = curves.mean(axis=0)
            self.metrics.echo_line(
                f"Epoch: {epoch + 1}  Val acc: {acc_curve[-1]:.3f}")
            self.metrics.log("val", epoch=epoch, step=self.global_step,
                             acc_curve=acc_curve.tolist())
            if acc_curve[-1] > self.max_acc:
                self.max_acc = float(acc_curve[-1])
                self.best_params = self.learner.params
            if (epoch + 1) % cfg.checkpoint_every_epochs == 0:
                self._save(epoch)

        return self._final_test(t_start)

    def _final_test(self, t_start: float) -> "FitResult":
        # final test: last model, then best model (train.py:129-146)
        cfg = self.cfg
        last_curves = self.evaluate("test")
        best_curves = self.evaluate("test", params=self.best_params)
        last_mean = last_curves.mean(axis=0)
        best_mean = best_curves.mean(axis=0)
        # reference-style contaminated average (train.py:130-146: the list is
        # not reset between the two loops)
        contaminated = np.concatenate([last_curves, best_curves], 0).mean(0)

        self.metrics.echo_line(f"Test acc: {last_mean[1]:.3f}")
        self.metrics.echo_line(f"Early Stopped Test acc: {contaminated[-1]:.3f}")
        self.metrics.echo_line(f"Total Time: {time.time() - t_start:.1f}")
        result = FitResult(
            test_acc_ref=float(last_mean[1]),
            test_acc_final=float(last_mean[-1]),
            best_test_acc=float(best_mean[-1]),
            early_stopped_ref=float(contaminated[-1]),
            val_max_acc=self.max_acc,
            epochs_run=cfg.epoch - getattr(self, "_fit_from_epoch", 0),
            global_step=self.global_step)
        self.metrics.log("fit_result", **dataclasses.asdict(result))
        return result


# ---- dataset assembly ------------------------------------------------------

def build_datasets(cfg: Config):
    """Load an on-disk dataset (reference format) and build the three
    episodic MetaDatasets. Returns (store, datasets, labels_num)."""
    from gmeta_tpu.data.extract import SubgraphExtractor
    from gmeta_tpu.data.io import Dataset
    from gmeta_tpu.data import native

    data = Dataset(cfg.data_dir, cfg.task_setup, cfg.link_pred_mode,
                   task_mode=cfg.task_mode, task_n=cfg.task_n)
    use_native = (cfg.extractor == "native"
                  or (cfg.extractor == "auto" and native.available()))
    cache_file = None
    if use_native:
        extractor = native.NativeSubgraphExtractor(
            data.store.graphs, h=cfg.h, sample_nodes=cfg.sample_nodes,
            seed=cfg.seed, n_threads=max(cfg.num_workers, 0),
            cap_strategy=cfg.cap_strategy)
        if cfg.extract_disk_cache:
            # sound only for the native engine: its cap RNG is content-
            # derived per name, so partial caches compose bit-exactly
            from gmeta_tpu.data import extract_cache
            cache_file = extract_cache.cache_path(
                cfg.data_dir, cfg.h, cfg.sample_nodes, cfg.cap_strategy)
            if os.path.exists(cache_file):
                extractor.cache.update(extract_cache.load(cache_file))
                print(f"extraction cache: {len(extractor.cache)} subgraphs "
                      f"from {cache_file}")
    else:
        extractor = SubgraphExtractor(
            data.store.graphs, h=cfg.h, sample_nodes=cfg.sample_nodes,
            seed=cfg.seed, cap_strategy=cfg.cap_strategy)
    # Which backend actually runs matters for throughput debugging: with
    # extractor="auto" the numpy fallback is silent otherwise.
    print(f"extractor: {'native C++' if use_native else 'numpy'} "
          f"(requested {cfg.extractor!r})")
    # input_dim mirrors the reference: derived from the feature width at
    # load (train.py:67); a user-set nonzero value must agree with the data.
    if cfg.input_dim and cfg.input_dim != data.store.feat_dim:
        raise ValueError(
            f"input_dim={cfg.input_dim} != features width "
            f"{data.store.feat_dim}")
    cfg.input_dim = data.store.feat_dim

    datasets = {}
    # Per-split sampler-seed offsets: the reference consumes one global RNG
    # stream across the three Subgraphs constructions (train.py:89-91), so
    # its splits never sample identical episode sequences; identical seeds
    # here would correlate val and test episodes.
    salt = {"train": 0, "val": 101, "test": 202}
    # One shared dense-label map across the three splits (tens of GB saved
    # at Tree-of-Life scale vs three private remapped copies).
    from gmeta_tpu.data.pipeline import map_labels
    dense = map_labels(data.labels)
    for mode in ("train", "val", "test"):
        split = data.splits[mode]
        datasets[mode] = MetaDataset(
            data.store, extractor, split["main"], data.labels,
            task_setup=cfg.task_setup, link_pred_mode=cfg.link_pred_mode,
            n_way=cfg.n_way, k_spt=cfg.k_spt, k_qry=cfg.k_qry,
            batchsz=cfg.batchsz if mode == "train" else cfg.eval_batchsz,
            index_spt=split.get("spt"), index_qry=split.get("qry"),
            seed=cfg.seed + salt[mode], dense_labels=dense)
    if cache_file is not None:
        from gmeta_tpu.data import extract_cache
        known = 0
        if os.path.exists(cache_file):
            known = len(np.load(cache_file, allow_pickle=False)["names"])
        if len(extractor.cache) > known:
            # drop only THIS parameterization's superseded caches; other
            # (h, sample_nodes, cap) configs' caches stay valid
            for stale in extract_cache.stale_paths(cfg.data_dir, cache_file):
                os.remove(stale)
            extract_cache.save(cache_file, extractor.cache)
            print(f"extraction cache: wrote {len(extractor.cache)} "
                  f"subgraphs to {cache_file}")
    # output dim: Disjoint -> n_way; Shared -> total class count
    # (train.py:58-61)
    labels_num = cfg.n_way if cfg.task_setup == "Disjoint" else data.total_class
    return data.store, datasets, labels_num


def main(argv=None):
    # allow_abbrev=False: the reference README's misspelled `--link_pred_mod
    # True` only worked through argparse prefix matching (train.py:174,
    # README.md:153,177); flags must be spelled out here (MIGRATION.md).
    ap = argparse.ArgumentParser("gmeta_tpu.run.train", allow_abbrev=False)
    ap.add_argument("--preset", choices=sorted(PRESETS), default=None)
    for f in dataclasses.fields(Config):
        if f.type in ("int", "float", "str"):
            ap.add_argument(f"--{f.name}",
                            type={"int": int, "float": float, "str": str}[f.type],
                            default=None)
        elif f.type == "bool":
            ap.add_argument(f"--{f.name}", type=lambda s: s == "True",
                            default=None)
    ap.add_argument("--mesh_tasks", type=int, default=0,
                    help="shard the meta-batch over this many devices")
    ap.add_argument("--mesh_edges", type=int, default=0,
                    help="edge-partition the (union) graph over this many "
                         "devices and train with the sharded full-graph "
                         "engine (run/edgepart.py) instead of packed "
                         "subgraphs; combines with --mesh_tasks for "
                         "('task','edge') 2D meshes")
    args = ap.parse_args(argv)

    cfg = PRESETS[args.preset] if args.preset else Config()
    cfg = dataclasses.replace(cfg)
    for f in dataclasses.fields(Config):
        v = getattr(args, f.name, None)
        if v is not None:
            setattr(cfg, f.name, v)
    cfg.validate()

    if args.mesh_edges:
        from gmeta_tpu.parallel.mesh import make_mesh
        from gmeta_tpu.run.edgepart import (EdgePartTrainer,
                                            build_edgepart_tasks)
        mesh = make_mesh(task=max(args.mesh_tasks, 1),
                         edge=args.mesh_edges)
        store, tasks, labels_num = build_edgepart_tasks(cfg)
        trainer = EdgePartTrainer(cfg, store, tasks, labels_num, mesh)
        result = trainer.fit()
        print(result)
        return result

    mesh = None
    if args.mesh_tasks:
        from gmeta_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(task=args.mesh_tasks)

    store, datasets, labels_num = build_datasets(cfg)
    trainer = Trainer(cfg, store, datasets, labels_num, mesh=mesh)
    result = trainer.fit()
    print(result)
    return result


if __name__ == "__main__":
    main()
