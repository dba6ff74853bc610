"""Decompose the streaming-path step time at the arxiv shape (VERDICT r3
weak 1: parity arxiv ran 19.7 tasks/s streaming vs 44.3 from the device
pool on IDENTICAL compute — find where the extra ~0.8 s/step goes).

Measures, at the exact arxiv parity buckets (spt P=1024 B=9 E=18432, qry
P=1024 B=72 E=129024, T=32 tasks, H=256, feat 128):

  pack_s       host: stack_tasks of 32 pre-packed tasks (what batches()
               does per step after the first epoch's extraction cache)
  transfer_s   host->device: device_put of the packed batch + block
  wire_mb      bytes shipped per step
  dispatch_s   device: one no-op jitted call round-trip (tunnel latency)
  step_pool_s  device: one train step gathered from a resident pool
  step_stream_s  end-to-end streaming step (transfer + dispatch + compute)

Usage: python scripts/bench_transfer.py [--tasks 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def synth_packed(T, P_spt, B_spt, E_spt, P_qry, B_qry, E_qry,
                 S_spt, S_qry, n_feat, rng):
    """A random packed TaskBatch at the given buckets (valid structure:
    edges within bins, centers on live slots)."""
    from gmeta_tpu.data.pack import SubgraphSet, TaskBatch

    def one_set(P, B, E, S):
        node_gid = rng.randint(0, n_feat, size=(T, B, P)).astype(np.int32)
        node_mask = np.ones((T, B, P), np.float32)
        bin_of = rng.randint(0, B, size=(T, E))
        src_l = rng.randint(0, P, size=(T, E))
        dst_l = rng.randint(0, P, size=(T, E))
        edge_src = (bin_of * P + src_l).astype(np.int32)
        edge_dst = np.sort((bin_of * P + dst_l).astype(np.int32), axis=1)
        edge_mask = np.ones((T, E), np.float32)
        centers = rng.randint(0, B * P, size=(T, S, 2)).astype(np.int32)
        labels = np.tile(np.arange(S) % 3, (T, 1)).astype(np.int32)
        bin_fill = np.full((T, B), P, np.int32)
        return SubgraphSet(node_gid, node_mask, edge_src, edge_dst,
                           edge_mask, centers, labels, bin_fill)

    return TaskBatch(spt=one_set(P_spt, B_spt, E_spt, S_spt),
                     qry=one_set(P_qry, B_qry, E_qry, S_qry))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tasks", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))

    from gmeta_tpu.data.pack import TaskBatch
    from gmeta_tpu.meta.maml import MetaLearner

    T = args.tasks
    rng = np.random.RandomState(0)
    n_feat = 169_343
    feats = rng.randn(n_feat, 128).astype(np.float32)
    batch_np = synth_packed(T, 1024, 9, 18432, 1024, 72, 129024,
                            S_spt=9, S_qry=72, n_feat=n_feat, rng=rng)
    wire_mb = sum(a.nbytes for a in jax.tree.leaves(batch_np)) / 1e6

    spec = (("GraphConv", (128, 256)), ("GraphConv", (256, 256)),
            ("Linear", (256, 3)))
    # task_chunk=8 bounds live query adjacencies (a 32-task full vmap
    # holds ~10 GB of densified A and OOMs 16 GB HBM)
    learner = MetaLearner(spec, 3, update_lr=0.01, meta_lr=1e-3,
                          update_step=10, update_step_test=20,
                          track_curve=False, task_chunk=8)
    learner.set_features(feats)

    out = {"tasks": T, "wire_mb": round(wire_mb, 1)}

    # host: per-task stack (the steady-state per-step host work: packing is
    # cached after epoch 1; stack_tasks is the remaining copy)
    per_task = [jax.tree.map(lambda x: x[i], batch_np) for i in range(T)]
    t0 = time.time()
    from gmeta_tpu.data.pack import stack_tasks
    for _ in range(args.reps):
        _ = stack_tasks(per_task)
    out["pack_s"] = round((time.time() - t0) / args.reps, 4)

    # transfer: host->device + block
    for _ in range(2):  # warm
        h = jax.device_put(batch_np)
        jax.block_until_ready(h)
    t0 = time.time()
    for _ in range(args.reps):
        h = jax.device_put(batch_np)
        jax.block_until_ready(h)
    out["transfer_s"] = round((time.time() - t0) / args.reps, 4)
    out["transfer_mb_s"] = round(wire_mb / out["transfer_s"], 1)

    # dispatch latency: no-op round trip
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(8)
    jax.block_until_ready(f(x))
    t0 = time.time()
    for _ in range(20):
        jax.block_until_ready(f(x))
    out["dispatch_s"] = round((time.time() - t0) / 20, 4)

    # compute: step from resident pool (per-step wire = 32 ints)
    pool_dev = jax.tree.map(jnp.asarray, batch_np)
    learner.set_task_pool(pool_dev)
    idxs = np.arange(T)
    m = learner.train_step_from_pool(idxs)       # compile
    jax.block_until_ready(m["meta_loss"])
    t0 = time.time()
    for _ in range(args.reps):
        m = learner.train_step_from_pool(idxs)
        jax.block_until_ready(m["meta_loss"])
    out["step_pool_s"] = round((time.time() - t0) / args.reps, 4)

    # end-to-end streaming step: host stack + transfer + compute
    m = learner.train_step(batch_np)             # compile (same program)
    jax.block_until_ready(m["meta_loss"])
    t0 = time.time()
    for _ in range(args.reps):
        b = stack_tasks(per_task)
        m = learner.train_step(b)
        jax.block_until_ready(m["meta_loss"])
    out["step_stream_s"] = round((time.time() - t0) / args.reps, 4)

    out["stream_tasks_per_s"] = round(T / out["step_stream_s"], 1)
    out["pool_tasks_per_s"] = round(T / out["step_pool_s"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
