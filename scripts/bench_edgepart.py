"""Absolute full-graph edges/s of the edge-partitioned engine on the real
chip (VERDICT r4 item 6, last bullet).

Runs the EdgePartMetaTrainer train step on a prefix of the Tree-of-Life
replica's graph union (graphs.npz only — labels/episodes are synthesized,
this measures the compute path) at --mesh_edges 1 on the single TPU and
reports edges ingested per second (union edges x layers x inner fwd+bwd
passes counted as ONE task traversal, matching run/edgepart.py's metric).

Why a prefix: the FULL 5.33M-node / 60.8M-edge union crashes the TPU
worker through the tunnel (reproduced at hidden 16 and 8, with the halo
all_to_all already statically removed — the 60M-row gather/scatter
program itself faults; logs r5_edgepart_tol). The virtual-mesh run of
EDGEPART.md covers full scale over 4 edge shards, where per-shard edge
counts are a quarter of this; --graphs here sizes the single-shard bench
to the largest union that executes.

Usage: python scripts/bench_edgepart.py [--graphs 400] [--hidden 16]
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


def main():
    ap = argparse.ArgumentParser("bench_edgepart")
    ap.add_argument("--graphs", type=int, default=400)
    ap.add_argument("--hidden", type=int, default=16)
    ap.add_argument("--update_step", type=int, default=2)
    ap.add_argument("--task_num", type=int, default=8)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--data", default=os.path.join(ROOT, "replicas",
                                                   "tree_of_life"))
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))

    from gmeta_tpu.data.graph import GraphStore
    from gmeta_tpu.data.io import load_graphs_npz
    from gmeta_tpu.parallel.edgepart_train import (EdgePartMetaTrainer,
                                                   EdgePartTask)
    from gmeta_tpu.parallel.mesh import make_mesh
    from gmeta_tpu.run.edgepart import union_graph

    graphs = load_graphs_npz(os.path.join(args.data, "graphs.npz"))
    graphs = graphs[:args.graphs]
    rng = np.random.RandomState(0)
    feats = [rng.randn(g.num_nodes, 1).astype(np.float32) for g in graphs]
    store = GraphStore(graphs, feats)
    g = union_graph(store)
    V, E = g.num_nodes, g.num_edges
    print(f"# union: {len(graphs)} graphs, {V:,} nodes, {E:,} edges",
          file=sys.stderr)

    mesh = make_mesh(task=1, edge=1)
    tr = EdgePartMetaTrainer(
        [(1, args.hidden), (args.hidden, args.hidden)], (args.hidden, 2), 2,
        g=g, feats=store.features, mesh=mesh, link_pred=True,
        update_lr=0.005, meta_lr=5e-4, update_step=args.update_step,
        update_step_test=args.update_step, seed=0)

    def make_task():
        T, S = args.task_num, 32
        c = rng.randint(0, V, size=(T, S, 2)).astype(np.int32)
        q = rng.randint(0, V, size=(T, S, 2)).astype(np.int32)
        y = np.tile(np.tile(np.arange(2), S // 2), (T, 1)).astype(np.int32)
        return EdgePartTask(c, y, q, y)

    m = tr.train_step(make_task())          # compile + warm
    float(np.asarray(m["meta_loss"]))
    t0 = time.time()
    for _ in range(args.steps):
        m = tr.train_step(make_task())
    float(np.asarray(m["meta_loss"]))
    dt = time.time() - t0
    tasks_per_s = args.steps * args.task_num / dt
    out = {
        "metric": "edgepart_fullgraph_edges_per_s",
        "value": round(tasks_per_s * E, 1),
        "unit": "edges/s",
        "graphs": len(graphs), "nodes": V, "edges": E,
        "hidden": args.hidden, "update_step": args.update_step,
        "tasks_per_s": round(tasks_per_s, 3),
        "step_s": round(dt / args.steps, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
