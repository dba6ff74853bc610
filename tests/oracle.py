"""Numpy oracle of the reference's model/loss math (DGL/torch semantics,
G-Meta/learner.py + meta.py), used to validate the TPU implementation.
Operates on raw edge lists — no packing, no padding, no jax."""

import numpy as np


def gcn_layer(h, edge_src, edge_dst, num_nodes, w, b, relu=True):
    """GraphConv forward per learner.py:25-54: symmetric clamp-normalization,
    aggregation over existing in-edges only (no self-loop), +bias, ReLU."""
    deg = np.zeros(num_nodes)
    np.add.at(deg, edge_dst, 1.0)
    norm = np.clip(deg, 1.0, None) ** -0.5
    h = h * norm[:, None]
    agg = np.zeros((num_nodes, h.shape[1]))
    np.add.at(agg, edge_dst, h[edge_src])
    out = agg @ w
    out = out * norm[:, None] + b
    return np.maximum(out, 0.0) if relu else out


def gcn_forward(h, edge_src, edge_dst, num_nodes, params, centers,
                link_pred=False):
    """Full Classifier.forward semantics (learner.py:134-194): GCN layers,
    center readout after the last GraphConv, Linear head (W shape (out,in))."""
    n_gcn = (len(params) - 2) // 2
    for i in range(n_gcn):
        w, b = params[2 * i], params[2 * i + 1]
        h = gcn_layer(h, edge_src, edge_dst, num_nodes, w, b)
    centers = np.asarray(centers)
    if link_pred:
        h = np.concatenate([h[centers[:, 0]], h[centers[:, 1]]], axis=1)
    else:
        h = h[centers[:, 0] if centers.ndim == 2 else centers]
    w, b = params[-2], params[-1]
    return h @ w.T + b


def euclidean_dist2(x, p):
    return ((x[:, None, :] - p[None, :, :]) ** 2).sum(-1)


def proto_loss(logits, y, protos=None):
    """meta.py:28-79 semantics: prototypes = per-class mean in sorted-unique
    class order; NLL of log_softmax(-dist^2); acc by argmax."""
    if protos is None:
        classes = np.unique(y)
        protos = np.stack([logits[y == c].mean(0) for c in classes])
        idx = np.searchsorted(classes, y)
    else:
        # prototypes supplied (query side): dense labels index proto rows
        idx = np.asarray(y)
    d2 = euclidean_dist2(logits, protos)
    # numerically stable log_softmax over -d2:
    z = -d2
    z = z - z.max(1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(1, keepdims=True))
    loss = -logp[np.arange(len(y)), idx].mean()
    acc = (np.argmax(logp, 1) == idx).mean()
    return loss, acc, protos
