"""Pallas size-aware SpMM kernel (ops/pallas_spmm.aggregate_sized) vs the
dense XLA path, in interpret mode (runs on the CPU test mesh; the compiled
kernel is exercised on real TPU by scripts/bench_pallas_spmm.py).

The kernel is the building block for the large-P regime where densified
(P, P) blocks waste HBM; the task path keeps the dense batched matmul
(ops/spmm.aggregate_dense), which measures faster at bin-packed episode
shapes (see pallas_spmm.py docstring).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gmeta_tpu.ops.pallas_spmm import aggregate_sized
from gmeta_tpu.ops.spmm import aggregate_dense


def _mk(S, P, H, sizes, seed=0):
    rng = np.random.RandomState(seed)
    A = np.zeros((S, P, P), np.float32)
    for s in range(S):
        n = sizes[s]
        for i in range(n):
            A[s, i, rng.randint(0, n, 4)] = 1.0
    h = rng.randn(S, P, H).astype(np.float32)
    return (jnp.asarray(A), jnp.asarray(h),
            jnp.asarray(np.asarray(sizes), jnp.int32))


def test_forward_matches_dense_on_live_rows():
    S, P, H = 3, 256, 32
    sizes = [256, 140, 70]
    A, h, sz = _mk(S, P, H, sizes)
    out = jax.jit(lambda A, h, sz: aggregate_sized(A, h, sz, True))(A, h, sz)
    ref = aggregate_dense(A, h)
    for s, n in enumerate(sizes):
        np.testing.assert_allclose(np.asarray(out)[s, :n],
                                   np.asarray(ref)[s, :n],
                                   rtol=1e-5, atol=1e-5)
        # rows at/beyond n are zero-filled (structurally zero in A too)
        np.testing.assert_array_equal(np.asarray(out)[s, n:], 0.0)


def test_backward_matches_dense():
    S, P, H = 2, 256, 16
    sizes = [200, 256]
    A, h, sz = _mk(S, P, H, sizes, seed=1)

    def lp(h):
        return (aggregate_sized(A, h, sz, True) ** 2).sum()

    def ld(h):
        return (aggregate_dense(A, h) ** 2).sum()

    gp = jax.jit(jax.grad(lp))(h)
    gd = jax.grad(ld)(h)
    for s, n in enumerate(sizes):
        np.testing.assert_allclose(np.asarray(gp)[s, :n],
                                   np.asarray(gd)[s, :n],
                                   rtol=1e-4, atol=1e-5)


def test_production_path_sized_matches_dense():
    """The wired dispatch (models/gcn.forward agg='sized', VERDICT r2 item
    5): a full meta-train step through MetaLearner with the Pallas kernel
    must reproduce the dense path bit-for-tolerance — pad bins have zero
    adjacency rows, so zero-fill == dense on every row."""
    from gmeta_tpu.config import Config, build_model_config
    from gmeta_tpu.data.synthetic import synthetic_disjoint
    from gmeta_tpu.meta.maml import MetaLearner

    store, ds = synthetic_disjoint(
        num_graphs=1, nodes_per_graph=400, avg_degree=6, feat_dim=8,
        num_classes=9, n_way=3, k_spt=3, k_qry=4, batchsz=8, h=2,
        sample_nodes=128, seed=3)
    cfg = Config(n_way=3, k_spt=3, k_qry=4, h=2, hidden_dim=16)
    spec = build_model_config(cfg, store.feat_dim, cfg.n_way)
    batch = next(ds["train"].batches(4, shuffle=False))
    assert batch.spt.bin_fill is not None  # packing carries live sizes

    outs = {}
    for agg in ("dense", "sized"):
        ml = MetaLearner(spec, cfg.n_way, update_lr=0.05, meta_lr=1e-3,
                         update_step=2, update_step_test=2, seed=0, agg=agg)
        ml.set_features(store.features)
        m = ml.train_step(batch)
        outs[agg] = (float(np.asarray(m["meta_loss"])),
                     np.asarray(m["accs"]),
                     [np.asarray(p) for p in ml.params])
    np.testing.assert_allclose(outs["dense"][0], outs["sized"][0],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(outs["dense"][1], outs["sized"][1],
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(outs["dense"][2], outs["sized"][2]):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_suggested_agg_policy():
    """Split-level dispatch: near-full bins -> dense; P not 128-aligned ->
    dense (kernel tile constraint)."""
    from gmeta_tpu.data.synthetic import synthetic_disjoint
    _, ds = synthetic_disjoint(
        num_graphs=1, nodes_per_graph=400, avg_degree=6, feat_dim=8,
        num_classes=9, n_way=3, k_spt=3, k_qry=4, batchsz=8, h=2,
        sample_nodes=128, seed=3)
    tr = ds["train"]
    assert tr.suggested_agg in ("dense", "sized")
    assert 0.0 < tr.mean_bin_fill <= 1.0
    if tr.mean_bin_fill >= 0.8:
        assert tr.suggested_agg == "dense"


def test_vmap_over_tasks():
    T, S, P, H = 2, 2, 128, 8
    rng = np.random.RandomState(2)
    As, hs, szs = [], [], []
    for t in range(T):
        sizes = rng.randint(60, P + 1, S)
        A, h, sz = _mk(S, P, H, sizes, seed=3 + t)
        As.append(A); hs.append(h); szs.append(sz)
    A, h, sz = jnp.stack(As), jnp.stack(hs), jnp.stack(szs)
    f = jax.vmap(lambda A, h, sz: aggregate_sized(A, h, sz, True))
    out = jax.jit(f)(A, h, sz)
    ref = jax.vmap(aggregate_dense)(A, h)
    mask = (np.arange(P)[None, None, :]
            < np.asarray(sz)[:, :, None]).astype(np.float32)
    np.testing.assert_allclose(np.asarray(out) * mask[..., None],
                               np.asarray(ref) * mask[..., None],
                               rtol=1e-5, atol=1e-5)


def test_vmap_shared_adjacency_no_copy():
    """vmap with a task-INVARIANT A must not materialize T copies of the
    (S,P,P) adjacency: the batching rule folds the task axis into the
    feature axis (the op is linear over feature columns) and binds the
    shared A once. Checks numerics vs the per-task dense reference."""
    T, S, P, H = 3, 2, 128, 8
    rng = np.random.RandomState(7)
    sizes = rng.randint(60, P + 1, S)
    A, _, sz = _mk(S, P, H, sizes, seed=11)
    h = jnp.asarray(rng.randn(T, S, P, H).astype(np.float32))
    f = jax.vmap(lambda h: aggregate_sized(A, h, sz, True))
    out = jax.jit(f)(h)
    ref = jax.vmap(lambda h: aggregate_dense(A, h))(h)
    mask = (np.arange(P)[None, :] < np.asarray(sz)[:, None]).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(out) * mask[None, :, :, None],
        np.asarray(ref) * mask[None, :, :, None], rtol=1e-5, atol=1e-5)
    # the folded bind must appear: trace and assert no (T,S,P,P) broadcast
    jaxpr = jax.make_jaxpr(f)(h)
    assert not any(
        v.aval.shape[:2] == (T * S, P) and v.aval.shape[-1] == P
        for eqn in jaxpr.jaxpr.eqns for v in eqn.outvars
        if len(v.aval.shape) == 3), "adjacency was tiled per task"


def test_meta_gradient_through_scan_of_grad():
    """Regression for the round-3 parity-probe crash on real TPU: the MAML
    meta-gradient — jax.grad through a lax.scan whose body itself calls
    jax.grad — left RAW pallas_calls in the inner vjp's jaxpr when
    aggregate_sized was a custom_vjp function (the inner grad consumes the
    wrappers), and the outer linearization then hit pallas's missing jvp
    rule. aggregate_sized is now a first-class primitive with jvp/transpose/
    batching rules, so every AD order is closed; this locks the exact
    failing composition (vmap over tasks of scan of grad) against the pure
    reference semantics."""
    T, S, P, H = 2, 2, 128, 8
    rng = np.random.RandomState(5)
    As, hs, szs = [], [], []
    for t in range(T):
        sizes = rng.randint(60, P + 1, S)
        A, h, sz = _mk(S, P, H, sizes, seed=7 + t)
        As.append(A); hs.append(h); szs.append(sz)
    A, h, sz = jnp.stack(As), jnp.stack(hs), jnp.stack(szs)

    from gmeta_tpu.ops.pallas_spmm import sized_reference

    def make(agg):
        def one_task(A, h, sz, w0):
            def inner(w):
                return (agg(A, h * w, sz) ** 2).mean()

            def step(w, _):
                return w - 0.1 * jax.grad(inner)(w), None

            w, _ = jax.lax.scan(step, w0, None, length=3)
            return agg(A, h * w, sz).sum()

        def meta(w0):
            return jax.vmap(lambda a, x, s: one_task(a, x, s, w0))(
                A, h, sz).mean()

        return jax.jit(jax.grad(meta))

    g = make(lambda A, h, sz: aggregate_sized(A, h, sz, True))(jnp.float32(1.0))
    gr = make(sized_reference)(jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=1e-4, atol=1e-6)
