"""Functional GCN classifier over packed subgraph batches.

Reproduces the reference's model math exactly (G-Meta/learner.py):

- symmetric normalization d^-1/2 with degree clamp(min=1), applied to the
  features before aggregation and to the result after (learner.py:28-32,49)
- aggregation over existing in-edges only; NO self-loop is added, so a
  node's own feature enters only via explicit self-edges (learner.py:38-45)
- matmul-order switch: project first when in_feats > out_feats
  (learner.py:34-47) — numerically equivalent, kept as a FLOP optimization
- +bias then ReLU per GraphConv (learner.py:51-54)
- after the LAST GraphConv: center-node readout by flat slot index
  (learner.py:159-170); LinkPred concatenates both endpoints' embeddings
  (learner.py:165-168)
- Linear head h @ W.T + b with W of shape (out, in) — (out, 2*in) in
  LinkPred mode (learner.py:83-90,172-175)

TPU mapping: the strided packing (pack.py) makes the batch adjacency
block-diagonal, so aggregation is a batched dense matmul on the MXU
(ops/spmm.py). `precompute` builds (A, norm) once per task — adjacency is
constant across the MAML inner loop, so no scatter ever runs inside the
scanned inner step.

Perf note (measured, do not "optimize"): folding both norm multiplies into
A at precompute (A_hat = diag(n) A diag(n)) is mathematically identical but
benched 8% SLOWER end-to-end (524 -> 486 tasks/s on v5e-1) — XLA already
fuses the per-layer h*norm elementwise into the gemm pipeline for free,
while the fold adds real (B, P, P) work per task per meta-step.

Parameters are a flat tuple of arrays (the functional analog of the
reference's nn.ParameterList fast weights, learner.py:73,138-139) so the
MAML inner loop can rebind them per step.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gmeta_tpu.data.pack import SubgraphSet
from gmeta_tpu.ops.spmm import aggregate_dense, degrees_from_dense, densify


class DenseGraph(NamedTuple):
    """Per-task precomputed aggregation operands (constant over inner steps)."""
    A: jnp.ndarray      # (B, P, P) block-diagonal adjacency over bins
    norm: jnp.ndarray   # (B, P, 1) clamp(deg,1)^-1/2
    h0: jnp.ndarray = None  # (B, P, F) gathered+masked input features, or None


def init_params(rng: jax.Array, layer_spec: Sequence[Tuple[str, tuple]]):
    """Flat (W, b, W, b, ...) tuple in config order, matching the reference
    inits: GraphConv W ~ xavier_uniform (in, out) with zero bias
    (learner.py:92-96); Linear W ~ kaiming_normal (out, in[*2]) with zero
    bias (learner.py:83-90)."""
    link_pred = layer_spec[-1][0] == "LinkPred"
    params = []
    for name, dims in layer_spec:
        if name == "GraphConv":
            fan_in, fan_out = dims
            rng, k = jax.random.split(rng)
            a = math.sqrt(6.0 / (fan_in + fan_out))
            w = jax.random.uniform(k, (fan_in, fan_out), jnp.float32, -a, a)
            params += [w, jnp.zeros((fan_out,), jnp.float32)]
        elif name == "Linear":
            fan_in, fan_out = dims
            in_eff = fan_in * 2 if link_pred else fan_in
            rng, k = jax.random.split(rng)
            std = math.sqrt(2.0 / in_eff)  # kaiming_normal_, fan_in mode, a=0
            w = jax.random.normal(k, (fan_out, in_eff), jnp.float32) * std
            params += [w, jnp.zeros((fan_out,), jnp.float32)]
        elif name == "LinkPred":
            pass
        else:
            raise ValueError(name)
    return tuple(params)


def precompute(sg: SubgraphSet, compute_dtype=jnp.float32,
               feats: jnp.ndarray = None) -> DenseGraph:
    """Build the block-diagonal adjacency + symmetric norm — and, when
    `feats` is given, the gathered input features — once per task. All three
    are constant across MAML inner steps, so neither scatter nor gather ever
    runs inside the scanned inner step."""
    B, P = sg.node_gid.shape[-2:]
    A = densify(sg.edge_src, sg.edge_dst, sg.edge_mask, B, P,
                dtype=compute_dtype)
    deg = degrees_from_dense(A)
    norm = jax.lax.rsqrt(jnp.maximum(deg, 1.0))[..., None]  # clamp(min=1)^-.5
    h0 = None
    if feats is not None:
        h0 = feats[sg.node_gid].astype(compute_dtype) * sg.node_mask[..., None]
    return DenseGraph(A=A, norm=norm.astype(compute_dtype), h0=h0)


def forward(params, sg: SubgraphSet, feats: jnp.ndarray,
            layer_spec: Sequence[Tuple[str, tuple]],
            dense: DenseGraph = None,
            compute_dtype=jnp.float32,
            agg: str = "dense",
            collect: list = None) -> jnp.ndarray:
    """Logits (S, out) for one packed subgraph set.

    `feats` is the global packed feature table; the gather by node_gid
    replaces the reference's host-side per-task np.vstack feature gather
    (meta.py:119-120).

    `agg` selects the aggregation kernel (a STATIC, per-compile choice the
    caller makes from split-level bucket statistics, pipeline.py):
    - "dense": XLA batched matmul over full (P, P) blocks — best when FFD
      bins pack near-full (the common case; pack.py).
    - "sized": the Pallas size-aware kernel (ops/pallas_spmm) that skips
      row/column tiles beyond each bin's live fill — wins when bins run
      underfull (high task-size variance under a split-global B, e.g.
      Shared-mode small-class fallback episodes).
    """
    link_pred = layer_spec[-1][0] == "LinkPred"
    B, P = sg.node_gid.shape[-2:]

    if dense is None:
        dense = precompute(sg, compute_dtype)
    A, norm = dense.A, dense.norm

    if agg == "sized":
        from gmeta_tpu.ops.pallas_spmm import aggregate_sized, sized_reference
        sizes = sg.bin_fill.astype(jnp.int32)
        if jax.default_backend() == "tpu":
            def _aggregate(A_, h_):
                return aggregate_sized(A_, h_, sizes)
        else:
            # off-TPU the kernel only exists in (slow) interpret mode; the
            # masked-matmul reference is semantics-identical on packed data
            # (tests/test_pallas.py locks kernel==reference equivalence)
            def _aggregate(A_, h_):
                return sized_reference(A_, h_, sizes)
    else:
        def _aggregate(A_, h_):
            return aggregate_dense(A_, h_)

    # (B, P, F) gather from the global feature table — replaces the
    # reference's host-side per-task np.vstack (meta.py:119-120). Reuses the
    # precomputed gather when available (constant across inner steps).
    if dense.h0 is not None:
        h = dense.h0
    else:
        h = feats[sg.node_gid].astype(compute_dtype) * sg.node_mask[..., None]

    idx = 0
    gcn_layers = [d for n, d in layer_spec if n == "GraphConv"]
    for li, (fan_in, fan_out) in enumerate(gcn_layers):
        w = params[idx].astype(compute_dtype)
        b = params[idx + 1].astype(compute_dtype)
        idx += 2
        # Matmuls accumulate in f32 (MXU native for bf16 inputs), results
        # cast back to the compute dtype — the bf16-compute/f32-accumulate
        # TPU idiom. With compute_dtype=f32 this is exact.
        h = h * norm
        if fan_in > fan_out:
            h = jnp.dot(h, w,
                        preferred_element_type=jnp.float32).astype(compute_dtype)
            h = _aggregate(A, h).astype(compute_dtype)
        else:
            h = _aggregate(A, h).astype(compute_dtype)
            h = jnp.dot(h, w,
                        preferred_element_type=jnp.float32).astype(compute_dtype)
        h = h * norm + b
        h = jax.nn.relu(h)
        if collect is not None:
            # per-layer activation capture for oracle-parity checks
            # (scripts/run_parity.py); no-op in production paths
            collect.append(h)
        if li == len(gcn_layers) - 1:
            h = h.reshape(B * P, -1)
            if link_pred:
                h = jnp.concatenate(
                    [h[sg.centers[:, 0]], h[sg.centers[:, 1]]], axis=1)
            else:
                h = h[sg.centers[:, 0]]

    w, b = params[idx], params[idx + 1]
    logits = jnp.dot(h, w.T.astype(compute_dtype),
                     preferred_element_type=jnp.float32) + b
    return logits.astype(jnp.float32)


def count_params(params) -> int:
    return int(sum(np.prod(p.shape) for p in params))
