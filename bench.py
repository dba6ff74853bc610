"""Benchmark: steady-state meta-training throughput (tasks/s) on an
arxiv-ogbn-shaped workload, vs the reference's measured 6.5 tasks/s
(test.ipynb cell 0: ~4.9 s per 32-task step on one GPU; BASELINE.md row 1).

Workload mirrors the arxiv recipe's compute shape (G-Meta/README.md:69-80):
Disjoint 3-way, k_spt=3, k_qry=24, h=2 (2 GCN layers), hidden 256,
sample_nodes-capped subgraphs. Synthetic graph stands in for the dataset
download; compute/memory shape per task matches (subgraphs at the node cap).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_TASKS_PER_S = 6.5

# Sized so 2-hop neighborhoods hit the sample_nodes cap like arxiv does,
# while extraction + compile stay within a few minutes.
GRAPH_NODES = 30_000
AVG_DEGREE = 16
FEAT_DIM = 128
HIDDEN = 256
N_WAY, K_SPT, K_QRY = 3, 3, 24
SAMPLE_NODES = 1000
TASK_POOL = 48
TASK_NUM = 8          # tasks per jitted meta-step (vmap width)
UPDATE_STEP = 10      # arxiv recipe (README.md:69-80)
WARMUP_STEPS = 2
MEASURE_STEPS = 32    # scanned on device: one dispatch for all of them


def main() -> None:
    import jax

    from gmeta_tpu.config import Config, build_model_config
    from gmeta_tpu.data.synthetic import synthetic_disjoint
    from gmeta_tpu.meta.maml import MetaLearner

    t0 = time.time()
    store, ds = synthetic_disjoint(
        num_graphs=1, nodes_per_graph=GRAPH_NODES, avg_degree=AVG_DEGREE,
        feat_dim=FEAT_DIM, num_classes=15, n_way=N_WAY, k_spt=K_SPT,
        k_qry=K_QRY, batchsz=TASK_POOL, h=2, sample_nodes=SAMPLE_NODES,
        seed=7, class_signal=2.0)
    train = ds["train"]
    print(f"# data: {time.time()-t0:.1f}s  buckets P_spt={train.P_spt} "
          f"E_spt={train.E_spt} P_qry={train.P_qry} E_qry={train.E_qry}",
          file=sys.stderr)

    cfg = Config(n_way=N_WAY, k_spt=K_SPT, k_qry=K_QRY, h=2, hidden_dim=HIDDEN)
    spec = build_model_config(cfg, store.feat_dim, cfg.n_way)
    # remat=False: jax.checkpoint around the scanned inner step explodes
    # XLA compile time (>10 min) at these shapes and memory fits without it.
    # bf16 compute / f32 accumulate+params: the TPU idiom (SURVEY.md §5.8).
    # track_curve=False: skip the per-inner-step query telemetry evals —
    # meta-gradients are bitwise the subject of tests/test_meta.py's
    # equivalence check; the trained model is identical, the reference's
    # per-step accuracy curve is optional telemetry here (config flag
    # track_train_curve).
    import jax.numpy as jnp
    ml = MetaLearner(spec, cfg.n_way, update_lr=0.01, meta_lr=1e-3,
                     update_step=UPDATE_STEP, update_step_test=UPDATE_STEP,
                     remat=False, compute_dtype=jnp.bfloat16, seed=0,
                     track_curve=False)
    ml.set_features(store.features)

    # Device-resident task pool: one-time transfer; each step ships only the
    # task indices (the tunnel-tolerant, TPU-native input path).
    ml.set_task_pool(train.stacked_pool())
    rng = np.random.RandomState(0)
    idx_stream = [rng.choice(TASK_POOL, TASK_NUM, replace=False)
                  for _ in range(WARMUP_STEPS + MEASURE_STEPS)]

    # Multi-meta-step scan: MEASURE_STEPS meta-steps run as ONE dispatch
    # (lax.scan over the index matrix, params carried on device) — dispatch
    # latency through the tunnel is amortized to zero, which is also how a
    # production epoch loop would run (train_steps_from_pool).
    meas = np.stack(idx_stream[WARMUP_STEPS:])

    # Warmup MUST use the same (K, task_num) shape as the measured call —
    # a different K compiles a different scan program.
    # NOTE: block_until_ready is a no-op on the tunneled axon backend; a
    # host value fetch is the only reliable synchronization point.
    t0 = time.time()
    m = ml.train_steps_from_pool(meas)
    float(np.asarray(m["meta_loss"])[-1])
    print(f"# compile+warmup: {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    m = ml.train_steps_from_pool(meas)
    float(np.asarray(m["meta_loss"])[-1])  # sync
    dt = time.time() - t0

    tasks_per_s = MEASURE_STEPS * TASK_NUM / dt
    print(f"# {MEASURE_STEPS} steps x {TASK_NUM} tasks in {dt:.2f}s; "
          f"final acc {float(np.asarray(m['accs'])[-1, -1]):.3f}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "meta_train_tasks_per_s",
        "value": round(tasks_per_s, 2),
        "unit": "tasks/s",
        "vs_baseline": round(tasks_per_s / BASELINE_TASKS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
