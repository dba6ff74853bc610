"""Worker for the two-process jax.distributed tests (SURVEY.md §4 tier 4).

Invoked as: python multihost_worker.py <process_id> <num_processes> <port>
<out.npz> [mode]. Each process owns 2 virtual CPU devices; init_multihost
brings up the global runtime (4 devices), then a sharded meta-train step
runs over the GLOBAL mesh and the (replicated) resulting params are dumped.

mode 'dp' (default): task-DP over a mesh(task=4) through MetaLearner.
mode 'edgepart': the edge-partitioned engine over a ('task','edge') =
(2, 2) mesh — each process holds one task group x one edge shard pair, so
BOTH the task-DP psum and the halo all_to_all cross the process boundary.

With num_processes=1 (and 4 local devices) the same script is the
single-process truth the test compares against.
"""

import os
import sys

pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]), sys.argv[3],
                         sys.argv[4])
mode = sys.argv[5] if len(sys.argv) > 5 else "dp"
per_proc = 4 // nproc
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={per_proc}")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from gmeta_tpu.config import Config, build_model_config  # noqa: E402
from gmeta_tpu.data.synthetic import synthetic_disjoint  # noqa: E402
from gmeta_tpu.meta.maml import MetaLearner  # noqa: E402
from gmeta_tpu.parallel.mesh import init_multihost, make_mesh  # noqa: E402

if nproc > 1:
    idx = init_multihost(coordinator_address=f"127.0.0.1:{port}",
                         num_processes=nproc, process_id=pid)
    assert idx == pid
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == per_proc

if mode == "dp":
    # identical construction on every process (pure function of the seed)
    store, ds = synthetic_disjoint(
        num_graphs=1, nodes_per_graph=150, avg_degree=5, feat_dim=8,
        num_classes=9, n_way=3, k_spt=3, k_qry=4, batchsz=8, h=2,
        sample_nodes=60, seed=3)
    cfg = Config(n_way=3, k_spt=3, k_qry=4, h=2, hidden_dim=16)
    spec = build_model_config(cfg, store.feat_dim, cfg.n_way)
    mesh = make_mesh(task=4)

    ml = MetaLearner(spec, cfg.n_way, update_lr=0.05, meta_lr=1e-3,
                     update_step=2, update_step_test=2, mesh=mesh, seed=0)
    # global replicated placement (every process supplies the full array)
    ml._feats = jax.device_put(jnp.asarray(store.features, jnp.float32),
                               NamedSharding(mesh, P()))

    batch = next(ds["train"].batches(4, shuffle=False))
    for _ in range(2):
        metrics = ml.train_step(batch)
    params = ml.params
else:
    assert mode == "edgepart", mode
    from gmeta_tpu.data.graph import synthetic_store  # noqa: E402
    from gmeta_tpu.parallel.edgepart_train import (  # noqa: E402
        EdgePartMetaTrainer, EdgePartTask)

    store, _ = synthetic_store(1, 257, 6, 8, 3, seed=5)
    g = store.graphs[0]
    mesh = make_mesh(task=2, edge=2)
    tr = EdgePartMetaTrainer([(8, 16), (16, 16)], (16, 3), 3, g=g,
                             feats=store.features, mesh=mesh,
                             update_lr=0.05, meta_lr=1e-3, update_step=3,
                             seed=11)
    rng = np.random.RandomState(0)
    for _ in range(2):
        T, S = 4, 6
        c_spt = rng.randint(0, g.num_nodes, size=(T, S, 1))
        c_qry = rng.randint(0, g.num_nodes, size=(T, S, 1))
        y = np.tile(np.tile(np.arange(3), S // 3), (T, 1))
        task = EdgePartTask(
            np.concatenate([c_spt, c_spt], 2).astype(np.int32),
            y.astype(np.int32),
            np.concatenate([c_qry, c_qry], 2).astype(np.int32),
            y.astype(np.int32))
        metrics = tr.train_step(task)
    params = tr.params

loss = float(np.asarray(jax.device_get(metrics["meta_loss"])))
params = [np.asarray(jax.device_get(p)) for p in params]
if pid == 0:
    np.savez(out, loss=loss, *params)
print(f"proc {pid}/{nproc}: loss {loss:.6f}", flush=True)
