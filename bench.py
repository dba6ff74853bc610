"""Benchmark: steady-state meta-training throughput on ALL FIVE reference
recipe shapes, vs the reference's measured per-recipe throughput
(test.ipynb cells 0-4; BASELINE.md).

Each shape benches the EXACT bucket geometry of that recipe's run of
record: when `parity/<recipe>.json` exists, its recorded compiled buckets
(P/B/E per set), bin fill, and aggregation kernel are replayed on a
synthesized packed pool — so this number bounds the production run from
above (same compiled step shapes, zero host pipeline) to within a measured
~3% content residual (each shape's JSON carries `production_tasks_per_s`
so the comparison is always visible; see bench_shape for the r5
measurement of the residual). Round 4's bench
diverged from production by up to 40x in both directions because its
synthetic graphs packed to different buckets than the replicas (VERDICT r4
weak 3); deriving geometry from the runs of record closes that. Recipes
without a parity record fall back to the synthetic-graph path (full
extraction + packing at whatever buckets result).

Per shape the JSON carries:
- tasks_per_s and vs_baseline against that recipe's own BASELINE.md row
- edges_per_s: REAL (unpadded) graph edges ingested per second
- mfu: measured FLOPs/s over the v5e chip's 197 TFLOP/s bf16 peak, with
  FLOPs taken from XLA's own cost analysis of the compiled step (not a
  hand model) — this is the honest "fast vs the chip" number; the dense
  block-diagonal path trades padding FLOPs for MXU regularity, so its MFU
  overstates useful work by the padding factor reported as `pad_waste`.
- compile_s: compile+first-dispatch time (r02 recorded an unexplained
  978 s compile; tracking it per shape makes a recurrence visible).

Also benches extraction: the jitted device-side extractor
(data/device_extract.py) vs the C++ host engine on the arxiv-shaped graph.

Prints ONE JSON line. Headline metric stays the arxiv-shape tasks/s
(continuity with BENCH_r01/r02); per-shape results are under "shapes".
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

PEAK_FLOPS_BF16 = 197e12   # TPU v5e (v5litepod) peak bf16 FLOP/s
MEASURE_STEPS = 16
POOL = 48

# Per-recipe baselines: tasks/s from BASELINE.md (task_num / step time).
SHAPES = {
    "arxiv": dict(kind="disjoint", baseline=6.5, nodes=170_000, deg=28,
                  feat=128, hidden=256, classes=15, n_way=3, k_spt=3,
                  k_qry=24, update_step=10, task_num=32, sample_nodes=1000),
    "tissue_ppi": dict(kind="shared", baseline=7.3, graphs=4, nodes=4_000,
                       deg=30, feat=50, hidden=128, classes=2, k_spt=3,
                       k_qry=10, update_step=10, task_num=4,
                       sample_nodes=1000),
    "fold_ppi": dict(kind="disjoint", baseline=4.3, nodes=30_000, deg=24,
                     feat=512, hidden=128, classes=15, n_way=3, k_spt=3,
                     k_qry=24, update_step=5, task_num=16,
                     sample_nodes=1000),
    "firstmm_db": dict(kind="link", baseline=12.3, graphs=4, nodes=1_350,
                       deg=6, feat=5, hidden=128, k_spt=16, k_qry=32,
                       update_step=10, task_num=8, sample_nodes=1000),
    "tree_of_life": dict(kind="link", baseline=11.1, graphs=4, nodes=2_900,
                         deg=14, feat=1, hidden=256, k_spt=16, k_qry=16,
                         update_step=10, task_num=8, sample_nodes=1000),
}


ROOT = os.path.dirname(os.path.abspath(__file__))

# Replica feature width + head classes per recipe — pinned by the
# reference's own printed parameter counts (BASELINE.md: 99,587 / 23,298 /
# 82,563 / 17,794 / 67,330), which the parity runs match bit-for-bit.
REPLICA_META = {
    "arxiv": dict(feat=128, n_out=3),
    "tissue_ppi": dict(feat=50, n_out=2),
    "fold_ppi": dict(feat=512, n_out=3),
    "firstmm_db": dict(feat=5, n_out=2),
    "tree_of_life": dict(feat=1, n_out=2),
}


def _load_parity(name):
    p = os.path.join(ROOT, "parity", f"{name}.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


def _synth_set(rng, P, B, E, S, n_out, fill, n_feat, real_edges, link):
    """One packed SubgraphSet at exactly the recorded bucket shape, with
    per-bin live fill matching the run of record (the sized kernel's tile
    skipping depends on it) and `real_edges` live intra-bin edges. Content
    is random — step cost at these shapes depends on the shapes, the fill
    and the gather widths, not on which neighbors the edges name."""
    from gmeta_tpu.data.pack import SubgraphSet
    live = np.full(B, min(max(int(round(fill * P)), 1), P), np.int32)
    mask = (np.arange(P)[None, :] < live[:, None]).astype(np.float32)
    # Clustered per-bin gids: a real subgraph's nodes are a local
    # neighborhood, so the per-task feature gather hits a narrow window of
    # the table. Uniform-random gids measurably understate production
    # throughput (worse HBM locality on the B*P x feat gather).
    base = rng.randint(0, max(n_feat - 4 * P, 1), size=(B, 1))
    node_gid = ((base + rng.randint(0, 4 * P, size=(B, P)))
                * (mask > 0)).astype(np.int32)
    e = min(int(real_edges), E)
    bins = rng.randint(0, B, size=e)
    src_l = (rng.random_sample(e) * live[bins]).astype(np.int64)
    dst_l = (rng.random_sample(e) * live[bins]).astype(np.int64)
    flat_dst = bins * P + dst_l
    order = np.argsort(flat_dst, kind="stable")   # nondecreasing dst
    edge_src = np.zeros(E, np.int32)
    edge_dst = np.full(E, B * P - 1, np.int32)
    edge_mask = np.zeros(E, np.float32)
    edge_src[:e] = (bins * P + src_l)[order]
    edge_dst[:e] = flat_dst[order]
    edge_mask[:e] = 1.0
    centers = np.zeros((S, 2), np.int32)
    for k in range(S):
        b = k % B
        c0 = int(rng.random_sample() * live[b])
        c1 = int(rng.random_sample() * live[b]) if link else c0
        centers[k] = (b * P + c0, b * P + c1)
    labels = np.tile(np.arange(n_out), S // n_out + 1)[:S].astype(np.int32)
    return SubgraphSet(node_gid=node_gid, node_mask=mask,
                       edge_src=edge_src, edge_dst=edge_dst,
                       edge_mask=edge_mask, centers=centers, labels=labels,
                       bin_fill=live)


def _pool_from_parity(name, s, rec):
    """(features_table, stacked pool, mean_edges_per_task, agg) replaying
    the run of record's compiled geometry: buckets + bin fill + kernel from
    parity/<name>.json, episode structure from the preset."""
    from gmeta_tpu.data.pack import TaskBatch, stack_tasks

    meta = REPLICA_META[name]
    b = rec["buckets"]
    fill = float(rec.get("mean_bin_fill", 0.7))
    agg = rec.get("agg", "dense")
    link = s["kind"] == "link"
    n_way = s.get("n_way", 2 if link else meta["n_out"])
    S_spt = n_way * s["k_spt"]
    S_qry = n_way * s["k_qry"]
    mean_edges = (rec["edges_per_s"] / rec["tasks_per_s"]
                  if rec.get("tasks_per_s") else 0.0)
    E_tot = b["E_spt"] + b["E_qry"]
    rng = np.random.RandomState(11)
    n_feat = 200_000
    feats = rng.randn(n_feat, meta["feat"]).astype(np.float32)
    tasks = []
    for _ in range(POOL):
        spt = _synth_set(rng, b["P_spt"], b["B_spt"], b["E_spt"], S_spt,
                         meta["n_out"], fill, n_feat,
                         mean_edges * b["E_spt"] / E_tot, link)
        qry = _synth_set(rng, b["P_qry"], b["B_qry"], b["E_qry"], S_qry,
                         meta["n_out"], fill, n_feat,
                         mean_edges * b["E_qry"] / E_tot, link)
        tasks.append(TaskBatch(spt=spt, qry=qry))
    return feats, stack_tasks(tasks), mean_edges, agg


def _build_dataset(name, s):
    from gmeta_tpu.data.synthetic import (synthetic_disjoint,
                                          synthetic_link_pred,
                                          synthetic_shared)
    if s["kind"] == "disjoint":
        store, ds = synthetic_disjoint(
            num_graphs=1, nodes_per_graph=s["nodes"], avg_degree=s["deg"],
            feat_dim=s["feat"], num_classes=s["classes"], n_way=s["n_way"],
            k_spt=s["k_spt"], k_qry=s["k_qry"], batchsz=POOL, h=2,
            sample_nodes=s["sample_nodes"], seed=7)
        n_out = s["n_way"]
    elif s["kind"] == "shared":
        store, ds = synthetic_shared(
            num_graphs=s["graphs"], nodes_per_graph=s["nodes"],
            avg_degree=s["deg"], feat_dim=s["feat"],
            num_classes=s["classes"], k_spt=s["k_spt"], k_qry=s["k_qry"],
            batchsz=POOL, h=2, sample_nodes=s["sample_nodes"], seed=7)
        n_out = s["classes"]
    else:
        store, ds = synthetic_link_pred(
            num_graphs=s["graphs"], nodes_per_graph=s["nodes"],
            avg_degree=s["deg"], feat_dim=s["feat"], k_spt=s["k_spt"],
            k_qry=s["k_qry"], batchsz=POOL,
            sample_nodes=s["sample_nodes"], seed=7)
        n_out = 2
    return store, ds["train"], n_out


def bench_shape(name: str, s: dict) -> dict:
    import jax
    import jax.numpy as jnp

    from gmeta_tpu.config import Config, build_model_config
    from gmeta_tpu.meta.maml import MetaLearner

    t0 = time.time()
    rec = _load_parity(name)
    if rec is not None:
        feats, pool, mean_edges, agg = _pool_from_parity(name, s, rec)
        buckets = dict(rec["buckets"])
        n_out = REPLICA_META[name]["n_out"]
        feat_dim = feats.shape[1]
        geometry = "parity_buckets"
    else:
        store, train, n_out = _build_dataset(name, s)
        feats, pool = store.features, train.stacked_pool()
        mean_edges = train.mean_edges_per_task
        agg = train.suggested_agg
        feat_dim = store.feat_dim
        buckets = dict(P_spt=train.P_spt, B_spt=train.B_spt,
                       E_spt=train.E_spt, P_qry=train.P_qry,
                       B_qry=train.B_qry, E_qry=train.E_qry)
        geometry = "synthetic"
    data_s = time.time() - t0
    print(f"# {name}: data {data_s:.1f}s [{geometry}] buckets"
          f" spt(P={buckets['P_spt']},B={buckets['B_spt']},"
          f"E={buckets['E_spt']}) qry(P={buckets['P_qry']},"
          f"B={buckets['B_qry']},E={buckets['E_qry']}) agg={agg}",
          file=sys.stderr)

    cfg = Config(h=2, hidden_dim=s["hidden"],
                 link_pred_mode=(s["kind"] == "link"),
                 task_setup="Shared" if s["kind"] != "disjoint" else "Disjoint")
    spec = build_model_config(cfg, feat_dim, n_out)
    # Replay the run of record's remat choice too: on the big-bucket shapes
    # rematerializing the inner step is FASTER (it avoids writing the
    # densified-adjacency scan residual — arxiv: ~4.3 GB/step — to HBM), so
    # a no-remat replay can land BELOW the production run it must bound.
    ov = rec.get("preset_overrides", {}) if rec is not None else {}
    # Execution mode of the replay, measured on the arxiv geometry (r5):
    # remat replay 153 tasks/s, no-remat 174 — remat costs ~12% compute
    # here, so the replay always runs WITHOUT remat (the fastest measured
    # config) to act as a ceiling. The run of record's pool mode (compact
    # HBM vs full stacked) is replayed faithfully; it measured neutral
    # (174.1 vs 174.4). Known residual: the production arxiv run (remat,
    # compact) records 180 — ~3% above any synthesized-content replay;
    # the synthesized pool's uniform bin/edge draw is that much heavier
    # per step than the real replica content at identical compiled shapes
    # (clustered-gid locality was tested and is NOT the cause).
    remat = False
    compact = bool(ov.get("device_task_pool", False))
    ml = MetaLearner(spec, n_out, update_lr=0.01, meta_lr=1e-3,
                     update_step=s["update_step"],
                     update_step_test=s["update_step"],
                     remat=remat, compute_dtype=jnp.bfloat16, seed=0,
                     track_curve=False, agg=agg)
    ml.set_features(feats)
    if compact:
        ml.set_task_pool_compact(pool)
        step_fn, pool_arg = ml._train_many_compact, ml._cpool
    else:
        ml.set_task_pool(pool)
        step_fn, pool_arg = ml._train_many_pool, ml._pool

    rng = np.random.RandomState(0)
    idx_mat = jnp.asarray(np.stack([
        rng.choice(POOL, s["task_num"], replace=False)
        for _ in range(MEASURE_STEPS)]), dtype=jnp.int32)

    # AOT compile: exact FLOPs from XLA's cost analysis + compile timing
    t0 = time.time()
    lowered = step_fn.lower(
        ml.params, ml.opt_state, pool_arg, idx_mat, ml._feats)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops_total = float(ca.get("flops", 0.0))
    except Exception:  # noqa: BLE001 — backend without cost analysis
        flops_total = 0.0
    # warmup dispatch (buffers, caches); host fetch is the only reliable
    # sync point through the tunnel
    out = compiled(ml.params, ml.opt_state, pool_arg, idx_mat, ml._feats)
    float(np.asarray(out[2]["meta_loss"])[-1])
    compile_s = time.time() - t0

    t0 = time.time()
    out = compiled(ml.params, ml.opt_state, pool_arg, idx_mat, ml._feats)
    float(np.asarray(out[2]["meta_loss"])[-1])
    dt = time.time() - t0

    tasks_per_s = MEASURE_STEPS * s["task_num"] / dt
    # padding waste of the dense aggregation: MAC slots vs real edges
    slots = (buckets["B_spt"] * buckets["P_spt"] ** 2
             + buckets["B_qry"] * buckets["P_qry"] ** 2)
    pad_waste = slots / max(mean_edges, 1.0)
    out = {
        "tasks_per_s": round(tasks_per_s, 2),
        "agg": agg,
        "geometry": geometry,
        "vs_baseline": round(tasks_per_s / s["baseline"], 2),
        "edges_per_s": round(tasks_per_s * mean_edges, 1),
        "mfu": round(flops_total / dt / PEAK_FLOPS_BF16, 4),
        "pad_waste": round(pad_waste, 1),
        "compile_s": round(compile_s, 1),
        "step_s": round(dt / MEASURE_STEPS, 4),
        "buckets": buckets,
    }
    if rec is not None and rec.get("tasks_per_s"):
        # the production run this geometry replays — the bench number
        # should bound it from above (same shapes, no host pipeline)
        out["production_tasks_per_s"] = rec["tasks_per_s"]
    return out


def bench_extraction() -> dict:
    """Device-side jitted extractor vs the C++ host engine, arxiv-shaped
    graph (VERDICT r2 item 3 'Done' criterion)."""
    from gmeta_tpu.data.device_extract import DeviceExtractor
    from gmeta_tpu.data import native
    from gmeta_tpu.data.graph import synthetic_store

    store, _ = synthetic_store(1, 170_000, 28, 8, 3, seed=3)
    g = store.graphs[0]
    rng = np.random.RandomState(0)
    C, ROUNDS = 64, 4
    centers = rng.randint(0, g.num_nodes, size=(ROUNDS, C)).astype(np.int64)

    dev = DeviceExtractor(g, h=2, sample_nodes=1000, set_cap=1 << 16,
                          hop_budget=1 << 18, edge_budget=1 << 17,
                          edge_out=1 << 15, seed=0)
    out = dev.extract_arrays(centers[0])          # compile + warm
    np.asarray(out.n_nodes)
    t0 = time.time()
    for r in range(ROUNDS):
        out = dev.extract_arrays(centers[r])
        np.asarray(out.n_nodes)                   # sync
    dev_rate = ROUNDS * C / (time.time() - t0)

    res = {"device_extract_per_s": round(dev_rate, 1)}
    if native.available():
        nat = native.NativeSubgraphExtractor([g], h=2, sample_nodes=1000,
                                             seed=0, n_threads=2)
        t0 = time.time()
        nat.extract_many([f"0_{c}" for c in centers.ravel()])
        res["native_extract_per_s"] = round(
            ROUNDS * C / (time.time() - t0), 1)
    return res


def main() -> None:
    # Persistent compile cache: the arxiv-shape (P=1024) train step compiles
    # in ~1000 s through the TPU tunnel (this, not an environment anomaly,
    # is BENCH_r02's "978 s compile" — reproduced and explained during the
    # round-3 parity runs). Identical-shape recompiles then hit disk.
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    shapes = {}
    for name, s in SHAPES.items():
        try:
            shapes[name] = bench_shape(name, s)
        except Exception as e:  # noqa: BLE001 — record, keep benching
            shapes[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
        print(f"# {name}: {shapes[name]}", file=sys.stderr)

    try:
        extraction = bench_extraction()
    except Exception as e:  # noqa: BLE001
        extraction = {"error": f"{type(e).__name__}: {e}"[:200]}
    print(f"# extraction: {extraction}", file=sys.stderr)

    arxiv = shapes.get("arxiv", {})
    print(json.dumps({
        "metric": "meta_train_tasks_per_s",
        "value": arxiv.get("tasks_per_s", 0.0),
        "unit": "tasks/s",
        "vs_baseline": arxiv.get("vs_baseline", 0.0),
        "shapes": shapes,
        "extraction": extraction,
    }))


if __name__ == "__main__":
    main()
