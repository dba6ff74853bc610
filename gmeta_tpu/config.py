"""Typed configuration with per-dataset presets.

Mirrors the reference's 22 argparse flags (G-Meta/train.py:152-177) as a typed
dataclass, fixing its string-boolean quirks (`--task_mode True`,
`--link_pred_mode True` as *strings*, G-Meta/train.py:50,74) while keeping the
same semantics. The five presets reproduce the README recipes
(G-Meta/README.md:66-179).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class Config:
    # --- task / episode structure (reference defaults: train.py:153-177) ---
    data_dir: str = ""
    task_setup: str = "Disjoint"        # 'Disjoint' | 'Shared'
    link_pred_mode: bool = False
    task_mode: bool = False             # Tissue-PPI: data under root/task{task_n}/
    task_n: int = 1
    n_way: int = 3
    k_spt: int = 3
    k_qry: int = 24
    h: int = 2                          # hop count; also sets GCN depth (train.py:69-70)
    sample_nodes: int = 1000            # subgraph node cap (train.py:177)
    batchsz: int = 1000                 # number of pre-sampled train tasks
    eval_batchsz: int = 100             # val/test tasks (train.py:90-91 hardcodes 100)

    # --- optimisation ---
    epoch: int = 10
    task_num: int = 8                   # meta batch size
    meta_lr: float = 1e-3
    update_lr: float = 1e-3
    update_step: int = 5
    update_step_test: int = 10
    first_order: bool = True            # reference never sets create_graph (meta.py:125,149)

    # --- model ---
    input_dim: int = 0                  # 0 = derive from features at load,
                                        # mirroring train.py:67; a nonzero
                                        # value must match the data
    hidden_dim: int = 64

    # --- runtime ---
    seed: int = 222                     # reference seeds torch/np at 222 (train.py:33-35)
    dtype: str = "float32"              # compute dtype for activations
    train_result_report_steps: int = 30
    num_workers: int = 0                # host pipeline prefetch threads
    # (mesh selection lives on the CLI: --mesh_tasks N)
    device_task_pool: bool = False      # place the train task pool in HBM once
                                        # and scan train_result_report_steps
                                        # meta-steps per dispatch (amortizes
                                        # host->device latency). Pools larger
                                        # than compact_pool_hbm_gb fall back
                                        # to the host-resident windowed
                                        # variant: the pool stays in host RAM
                                        # and each K-step scan consumes one
                                        # shipped window, transfer overlapped
                                        # with the previous window's compute.
    compact_pool_hbm_gb: float = 10.0   # HBM budget for the COMPACT resident
                                        # pool (no masks, packed edges, ~2.5x
                                        # smaller than the full packed pool;
                                        # decoded per window on device). The
                                        # first choice under device_task_pool;
                                        # pools above it fall to the host-
                                        # windowed variant.
    task_vmap_chunk: int = -1           # per-step task-vmap chunk (lax.map
                                        # batch_size): bounds live densified
                                        # adjacencies to chunk * (B*P^2) * 4B.
                                        # -1 = auto (~2.5 GB of live A), 0 =
                                        # full vmap, N > 0 = explicit. Ignored
                                        # with a task-DP mesh.
    host_pool_window: int = 8           # meta-steps per shipped window in the
                                        # host-pool mode (window bytes =
                                        # K * task_num * task size; 8*32
                                        # arxiv tasks ~= 620 MB)
    checkpoint_dir: str = ""            # empty = no checkpointing
    checkpoint_every_epochs: int = 1
    checkpoint_every_steps: int = 0     # 0 = epoch-granular only; N > 0 also
                                        # checkpoints every N train steps so a
                                        # kill mid-epoch resumes at the exact
                                        # batch (streaming path)
    metrics_path: str = ""              # jsonl metrics stream; empty = stdout only
    remat_inner: bool = False           # jax.checkpoint the inner-loop step
    track_train_curve: bool = True      # per-step query evals during training
                                        # (telemetry only, meta.py:129-157;
                                        # False trains identically ~2x faster)
    extractor: str = "auto"             # 'auto' | 'native' | 'numpy' host extraction
    extract_disk_cache: bool = True     # persist native-engine extractions
                                        # next to the dataset (~25 min saved
                                        # per rerun at ToL scale); keyed by
                                        # (h, sample_nodes, cap, graphs-file
                                        # identity), native engine only (its
                                        # cap RNG is content-derived, so
                                        # partial caches compose bit-exactly)
    agg: str = "auto"                   # aggregation kernel: 'auto' picks per
                                        # split from bin-fill stats
                                        # (pipeline.suggested_agg); 'dense' =
                                        # XLA batched matmul; 'sized' = Pallas
                                        # size-aware SpMM (ops/pallas_spmm)
    cap_strategy: str = "uniform"       # subgraph node-cap: 'uniform' (reference
                                        # parity, subgraph_data_processing.py:312-314)
                                        # | 'degree' (centrality-scored keep-top-k)
    profile_dir: str = ""               # jax.profiler trace dir; empty = off
    profile_steps: int = 5              # steps to trace (starting after compile)
    debug_nans: bool = False            # jax_debug_nans: fail loudly at the op
                                        # that produced a NaN instead of the
                                        # (counted) NaN-skip guard (SURVEY §5.2)

    @property
    def labels_num(self) -> int:
        raise RuntimeError("labels_num is dataset-dependent; use build_model_config")

    def validate(self) -> "Config":
        assert self.task_setup in ("Disjoint", "Shared"), self.task_setup
        if self.task_setup == "Shared" and self.n_way != Config.n_way:
            import warnings
            warnings.warn(
                "n_way is ignored in the Shared setup: every class of the "
                "sampled graph is used (subgraph_data_processing.py:198-217)",
                stacklevel=2)
        assert self.h in (1, 2, 3), "h must be 1, 2 or 3 (reference supports only these)"
        assert self.k_spt >= 1 and self.k_qry >= 1 and self.n_way >= 2
        assert self.cap_strategy in ("uniform", "degree"), self.cap_strategy
        assert self.agg in ("auto", "dense", "sized"), self.agg
        assert self.update_step >= 1 and self.update_step_test >= 1
        if self.link_pred_mode:
            assert self.task_setup == "Shared", "link prediction uses the Shared setup"
        return self


def build_model_config(cfg: Config, input_dim: int, labels_num: int):
    """Synthesise the layer spec exactly like the reference (train.py:67-75):
    h GraphConv layers (depth tied to hop count) then a Linear head; LinkPred
    doubles the head's input via endpoint-pair concat (learner.py:85,165-168).
    """
    layers = [("GraphConv", (input_dim, cfg.hidden_dim))]
    for _ in range(cfg.h - 1):
        layers.append(("GraphConv", (cfg.hidden_dim, cfg.hidden_dim)))
    layers.append(("Linear", (cfg.hidden_dim, labels_num)))
    if cfg.link_pred_mode:
        layers.append(("LinkPred", (True,)))
    return tuple(layers)


# The five README recipes (G-Meta/README.md:66-179). `h` defaults to 2 everywhere
# (none of the recipes overrides it).
PRESETS = {
    "arxiv": Config(
        task_setup="Disjoint", n_way=3, k_spt=3, k_qry=24, h=2,
        epoch=10, task_num=32, batchsz=10000, hidden_dim=256,
        update_lr=0.01, meta_lr=1e-3, update_step=10, update_step_test=20,
        train_result_report_steps=200,
    ),
    "tissue_ppi": Config(
        task_setup="Shared", task_mode=True, task_n=4, k_spt=3, k_qry=10, h=2,
        epoch=15, task_num=4, batchsz=1000, hidden_dim=128,
        update_lr=0.01, meta_lr=5e-3, update_step=10, update_step_test=10,
        train_result_report_steps=200,
    ),
    "fold_ppi": Config(
        task_setup="Disjoint", n_way=3, k_spt=3, k_qry=24, h=2,
        epoch=5, task_num=16, batchsz=4000, hidden_dim=128,
        update_lr=0.005, meta_lr=1e-3, update_step=5, update_step_test=20,
        train_result_report_steps=100,
    ),
    "firstmm_db": Config(
        task_setup="Shared", link_pred_mode=True, n_way=2, k_spt=16, k_qry=32, h=2,
        epoch=15, task_num=8, batchsz=1500, hidden_dim=128,
        update_lr=0.01, meta_lr=5e-4, update_step=10, update_step_test=20,
        train_result_report_steps=200,
    ),
    "tree_of_life": Config(
        task_setup="Shared", link_pred_mode=True, n_way=2, k_spt=16, k_qry=16, h=2,
        epoch=15, task_num=8, batchsz=5000, hidden_dim=256,
        update_lr=0.005, meta_lr=5e-4, update_step=10, update_step_test=20,
        train_result_report_steps=200,
    ),
}
