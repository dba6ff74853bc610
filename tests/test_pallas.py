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
                               np.asarray(ref) * mask[..., None], rtol=1e-5)
