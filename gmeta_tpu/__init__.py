"""gmeta_tpu — a TPU-native graph meta-learning framework.

Re-implements the capabilities of G-Meta (Huang & Zitnik, NeurIPS 2020;
reference: mims-harvard/G-Meta) from scratch on JAX/XLA/Pallas:

- few-shot node classification and link prediction over h-hop local subgraphs
  (reference: G-Meta/subgraph_data_processing.py)
- ProtoMAML meta-learning: prototype losses + first-order MAML inner loop
  (reference: G-Meta/meta.py)
- symmetric-normalized GCN over batched subgraphs
  (reference: G-Meta/learner.py)

Design: static-shape flat-packed subgraph batches, `lax.scan` inner loops,
`jax.vmap` over tasks, `jax.sharding.Mesh` data-parallel meta-batches, and
Pallas SpMM kernels for the aggregation hot path.
"""

__version__ = "0.1.0"

from gmeta_tpu.config import Config, PRESETS  # noqa: F401
