"""Replica difficulty calibration — fast numpy proxies, no training.

The replica generators (scripts/make_replicas.py) have difficulty knobs
(class-signal strength, label noise, hub mix). This script estimates the
few-shot accuracy a trained 2-layer GCN + prototype head can reach on a
candidate replica WITHOUT a TPU run, so the knobs can be tuned to land in
the reference's accuracy band (test.ipynb cells 0-4) instead of at ceiling
or chance.

Why the proxy is faithful:

- The ProtoMAML head classifies by log_softmax(-||q - c_k||^2) over class
  prototypes (meta.py:28-79). For n_way=2 this is EXACTLY a linear
  classifier in logit space (d(q,c0)^2 - d(q,c1)^2 is linear in q), and for
  n_way=3 piecewise-linear — so the learnable signal is the MEAN separation
  of classes under a linear map of the embedding.
- A trained h-layer GCN embedding is a learned channel-mixing of the
  sym-normalized h-hop aggregate A_hat^h X (plus ReLU nonlinearities). The
  information available to the linear map is therefore bracketed by
  prototype accuracy in raw A_hat^h X space (no learned mixing; lower
  bound) and LDA accuracy in that space (optimal linear mixing; upper
  bound-ish). Observed TPU runs land between the two brackets.

Usage: python scripts/calibrate_replicas.py [recipe ...]
(pure numpy — safe to run while a TPU process holds the tunnel, via
 PYTHONPATH= to skip the axon sitecustomize).
"""

from __future__ import annotations

import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

from make_replicas import (block_labels, class_features,  # noqa: E402
                           ring_hub_pairs, smooth_field)


def agg_hops(pairs: np.ndarray, n: int, X: np.ndarray, hops: int = 2):
    """A_hat^hops X with the reference's symmetric clamp-normalization and
    no self-loop (learner.py:28-49), on the bidirectionalized edge set."""
    src = np.concatenate([pairs[:, 0], pairs[:, 1]])
    dst = np.concatenate([pairs[:, 1], pairs[:, 0]])
    deg = np.zeros(n)
    np.add.at(deg, dst, 1.0)
    norm = np.clip(deg, 1.0, None) ** -0.5
    h = X.astype(np.float32)
    for _ in range(hops):
        h = h * norm[:, None]
        agg = np.zeros_like(h)
        np.add.at(agg, dst, h[src])
        h = agg * norm[:, None]
    return h


def proto_acc(emb_by_class, k_spt, k_qry, episodes, rng, lda=False):
    """Mean episodic prototype accuracy. emb_by_class: list of (N_c, F)
    embeddings, one per class of the episode universe (classes are sampled
    n_way at a time when more than n_way given)."""
    n_way = len(emb_by_class)
    accs = []
    for _ in range(episodes):
        spt, qry, qy = [], [], []
        for c, E in enumerate(emb_by_class):
            idx = rng.choice(len(E), k_spt + k_qry, replace=False)
            spt.append(E[idx[:k_spt]])
            qry.append(E[idx[k_spt:]])
            qy.append(np.full(k_qry, c))
        qry = np.concatenate(qry)
        qy = np.concatenate(qy)
        if lda:
            # whiten by pooled within-class covariance (diagonal, shrunk)
            pooled = np.concatenate([s - s.mean(0) for s in spt])
            var = pooled.var(0) + 1e-3 * pooled.var() + 1e-12
            w = var ** -0.5
            protos = np.stack([(s * w).mean(0) for s in spt])
            qw = qry * w
        else:
            protos = np.stack([s.mean(0) for s in spt])
            qw = qry
        d2 = ((qw[:, None, :] - protos[None]) ** 2).sum(-1)
        accs.append((d2.argmin(1) == qy).mean())
    return float(np.mean(accs))


# ---- node recipes -----------------------------------------------------------

def proxy_node(n, feat_dim, classes, n_way, k_spt, k_qry, local_k, hub_deg,
               hub_alpha, noise, signal, episodes=300, seed=0, rank=0):
    from make_replicas import shared_subspace_centers
    rng = np.random.RandomState(seed)
    pairs = ring_hub_pairs(n, local_k, hub_deg, hub_alpha, rng)
    y = block_labels(n, classes, noise, rng)
    centers = (shared_subspace_centers(classes, feat_dim, rank, rng)
               if rank else rng.randn(classes, feat_dim).astype(np.float32))
    X = class_features(y, feat_dim, signal, centers, rng)
    emb = agg_hops(pairs, n, X, 2)
    lo, hi = [], []
    for _ in range(episodes // 50):
        cls = rng.choice(classes, n_way, replace=False)
        by = [emb[y == c] for c in cls]
        lo.append(proto_acc(by, k_spt, k_qry, 50, rng, lda=False))
        hi.append(proto_acc(by, k_spt, k_qry, 50, rng, lda=True))
    return np.mean(lo), np.mean(hi)


def proxy_tissue(n, feat_dim, local_k, hub_deg, base_win, feat_noise,
                 spike_dim=6, spike=3.0, k_spt=3, k_qry=10, episodes=300,
                 seed=0):
    rng = np.random.RandomState(seed)
    pairs = ring_hub_pairs(n, local_k, hub_deg, 0.75, rng)
    base = smooth_field(n, feat_dim, base_win, rng)
    base[:, :spike_dim] *= spike
    X = (base + feat_noise * rng.randn(n, feat_dim)).astype(np.float32)
    emb = agg_hops(pairs, n, X, 2)
    lo, hi = [], []
    for _ in range(episodes // 50):
        w = np.zeros(feat_dim)
        w[:spike_dim] = rng.randn(spike_dim)
        w /= np.linalg.norm(w)
        yt = (base @ w > 0)
        by = [emb[~yt], emb[yt]]
        lo.append(proto_acc(by, k_spt, k_qry, 50, rng, lda=False))
        hi.append(proto_acc(by, k_spt, k_qry, 50, rng, lda=True))
    return np.mean(lo), np.mean(hi)


def proxy_fold(n_graphs, n, feat_dim, classes, local_k, hub_deg, hub_alpha,
               noise, signal, assort, n_way=3, k_spt=3, k_qry=24,
               episodes=200, seed=0, rank=0):
    """Real fold geometry: MANY SMALL graphs (a 2-hop neighborhood spans
    ~half a graph), class-assortative hubs, episodes drawn across graphs —
    the single-big-graph proxy_node overestimated fold by ~0.24 because its
    neighborhoods stayed class-pure at 2-hop scale."""
    from make_replicas import (class_features, fold_graph,
                               shared_subspace_centers)
    rng = np.random.RandomState(seed)
    centers = (shared_subspace_centers(classes, feat_dim, rank, rng)
               if rank else rng.randn(classes, feat_dim).astype(np.float32))
    embs, ys = [], []
    for _ in range(n_graphs):
        pairs, y = fold_graph(n, classes, local_k, hub_deg, hub_alpha,
                              noise, assort, rng)
        X = class_features(y, feat_dim, signal, centers, rng)
        embs.append(agg_hops(pairs, n, X, 2))
        ys.append(y)
    emb = np.concatenate(embs)
    y = np.concatenate(ys)
    lo, hi = [], []
    for _ in range(episodes // 50):
        cls = rng.choice(classes, n_way, replace=False)
        by = [emb[y == c] for c in cls]
        lo.append(proto_acc(by, k_spt, k_qry, 50, rng, lda=False))
        hi.append(proto_acc(by, k_spt, k_qry, 50, rng, lda=True))
    return np.mean(lo), np.mean(hi)


# ---- link recipes -----------------------------------------------------------

def proxy_link(n, feat_dim, local_k, hub_deg, feature_kind, k_spt=16,
               k_qry=16, episodes=200, seed=0, noise=0.3, beta=2.0,
               z_win=16):
    """Endpoint-concat prototype accuracy for the link replicas: positives
    are graph edges (hub endpoints drawn by the smooth activity field),
    negatives sampled uniformly (prepare_link's candidate scheme)."""
    from make_replicas import link_features, ring_actz_pairs
    rng = np.random.RandomState(seed)
    pairs, z = ring_actz_pairs(n, local_k, hub_deg, beta, z_win, rng)
    deg = np.zeros(n)
    np.add.at(deg, pairs[:, 0], 1.0)
    np.add.at(deg, pairs[:, 1], 1.0)
    X = link_features(n, deg, z, feature_kind, rng, noise=noise)
    emb = agg_hops(pairs, n, X, 2)

    m = len(pairs)
    a = rng.randint(0, n, 4 * m)
    b = rng.randint(0, n - 1, 4 * m)
    b = np.where(b >= a, b + 1, b)
    negs = np.stack([a, b], 1)

    pos_emb = np.concatenate([emb[pairs[:, 0]], emb[pairs[:, 1]]], 1)
    neg_emb = np.concatenate([emb[negs[:, 0]], emb[negs[:, 1]]], 1)
    lo = proto_acc([neg_emb, pos_emb], k_spt, k_qry, episodes, rng, lda=False)
    hi = proto_acc([neg_emb, pos_emb], k_spt, k_qry, episodes, rng, lda=True)
    return lo, hi


RECIPE_PROXIES = {
    # scale-reduced graphs, identical per-node statistics; knobs == the
    # shipped make_replicas.py values; targets from test.ipynb:
    # final / early-stopped test acc
    "arxiv": (lambda: proxy_node(
        40_000, 128, 40, 3, 3, 24, local_k=5, hub_deg=3.6, hub_alpha=0.85,
        noise=0.65, signal=0.15, rank=16), (0.421, 0.436)),
    "tissue_ppi": (lambda: proxy_tissue(
        4_000, 50, local_k=10, hub_deg=8.0, base_win=24, feat_noise=0.6,
        spike_dim=2, spike=3.0), (0.780, 0.774)),
    "fold_ppi": (lambda: proxy_fold(
        16, 1_200, 512, 29, local_k=4, hub_deg=4.0, hub_alpha=0.8,
        noise=0.50, signal=0.18, assort=0.5, rank=6), (0.578, 0.656)),
    "firstmm_db": (lambda: proxy_link(
        1_350, 5, local_k=1, hub_deg=4.0, feature_kind="structural",
        noise=0.3, beta=2.5, z_win=32), (0.769, 0.756)),
    "tree_of_life": (lambda: proxy_link(
        2_900, 1, local_k=3, hub_deg=7.5, feature_kind="degree",
        noise=0.4, beta=2.5, z_win=32), (0.694, 0.723)),
}


def main():
    names = sys.argv[1:] or list(RECIPE_PROXIES)
    for name in names:
        fn, (tgt_final, tgt_early) = RECIPE_PROXIES[name]
        lo, hi = fn()
        print(f"{name}: proto(A^2X)={lo:.3f}  lda(A^2X)={hi:.3f}  "
              f"target={tgt_final:.3f}/{tgt_early:.3f}", flush=True)


if __name__ == "__main__":
    main()
