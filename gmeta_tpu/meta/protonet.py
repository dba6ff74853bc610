"""Prototype losses (ProtoNet-style) in logit space.

Matches the reference math (G-Meta/meta.py:14-79) under its standing
assumption of balanced class/shot counts (meta.py:37,63):

- prototypes = per-class mean of the support set's *logit-space* embeddings,
  rows ordered by sorted class id (torch.unique sorts) (meta.py:35-41)
- loss = NLL of log_softmax over negative squared euclidean distances to the
  prototypes; with balanced sets the reference's (n_classes, n_query) grouped
  mean equals the per-sample mean used here (meta.py:44-51,68-76)
- acc = mean over samples of argmax-class correctness (meta.py:52-53,77-78)

The reference forces this computation to CPU (meta.py:29-30,57-58) — an
implementation wart, not semantics; here it stays on device. Distances use
the |x|^2 + |p|^2 - 2 x.p form so the M x C Gram matrix rides the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def prototypes(logits: jnp.ndarray, y: jnp.ndarray, n_classes: int) -> jnp.ndarray:
    """(C, D) per-class means. Labels must be dense ints in [0, n_classes)."""
    onehot = jax.nn.one_hot(y, n_classes, dtype=logits.dtype)      # (M, C)
    counts = jnp.maximum(onehot.sum(axis=0), 1.0)                  # (C,)
    return (onehot.T @ logits) / counts[:, None]


def _sq_dists(x: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """(M, C) squared euclidean distances (euclidean_dist, meta.py:14-26)."""
    x2 = jnp.sum(x * x, axis=1, keepdims=True)                     # (M, 1)
    p2 = jnp.sum(p * p, axis=1)[None, :]                           # (1, C)
    cross = jnp.dot(x, p.T, preferred_element_type=jnp.float32)    # (M, C)
    return jnp.maximum(x2 + p2 - 2.0 * cross, 0.0)


def _dist_loss(logits: jnp.ndarray, y: jnp.ndarray, protos: jnp.ndarray):
    logp = jax.nn.log_softmax(-_sq_dists(logits, protos), axis=1)
    nll = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
    loss = nll.mean()
    acc = (jnp.argmax(logp, axis=1) == y).astype(jnp.float32).mean()
    return loss, acc


def proto_loss_spt(logits: jnp.ndarray, y: jnp.ndarray, n_classes: int):
    """(loss, acc, prototypes) on the support set; the support doubles as its
    own query here, exactly like meta.py:37,42 (n_query = n_support,
    query_idxs = support_idxs)."""
    protos = prototypes(logits, y, n_classes)
    loss, acc = _dist_loss(logits, y, protos)
    return loss, acc, protos


def proto_loss_qry(logits: jnp.ndarray, y: jnp.ndarray, protos: jnp.ndarray):
    """(loss, acc) of the query set against support-derived prototypes
    (meta.py:56-79)."""
    return _dist_loss(logits, y, protos)
