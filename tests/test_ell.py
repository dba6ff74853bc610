"""ELL slab aggregation (ops/spmm.build_ell + aggregate_ell) vs the
edge-list segment-sum oracle, including overflow slabs and empty rows."""

import numpy as np
import jax.numpy as jnp

from gmeta_tpu.ops.spmm import aggregate, aggregate_ell, build_ell


def _case(V, E, row_cap, seed):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, V, E)
    dst = rng.randint(0, V, E)
    # add a hub with degree >> row_cap to exercise overflow slabs
    hub_src = rng.randint(0, V, 5 * row_cap)
    src = np.concatenate([src, hub_src])
    dst = np.concatenate([dst, np.zeros(5 * row_cap, int)])
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    h = rng.randn(V, 16).astype(np.float32)

    want = aggregate(jnp.asarray(h), jnp.asarray(src), jnp.asarray(dst),
                     jnp.ones(len(src), np.float32), V)
    nbr, mask, row_id = build_ell(src, dst, V, row_cap=row_cap)
    got = aggregate_ell(jnp.asarray(h), jnp.asarray(nbr), jnp.asarray(mask),
                        jnp.asarray(row_id), V)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    return nbr, mask, row_id


def test_ell_matches_segment_sum():
    _case(V=200, E=1500, row_cap=8, seed=0)
    _case(V=64, E=100, row_cap=16, seed=1)   # many empty rows
    _case(V=10, E=400, row_cap=4, seed=2)    # dense, heavy overflow


def test_ell_slab_budget():
    """Total slab slots stay ~E + V*row_cap, not V*max_degree."""
    V, E, cap = 500, 4000, 8
    rng = np.random.RandomState(3)
    src, dst = rng.randint(0, V, E), rng.randint(0, V, E)
    order = np.argsort(dst, kind="stable")
    nbr, mask, row_id = build_ell(src[order], dst[order], V, row_cap=cap)
    assert nbr.shape[0] * cap <= (E + V * cap) * 1.1


def test_weighted_spmm_custom_vjp_matches_autodiff():
    """aggregate_weighted's hand-wired (SpMM^T, SDDMM) backward must equal
    jax.grad of the straightforward formulation."""
    import jax
    from gmeta_tpu.ops.spmm import aggregate_weighted
    rng = np.random.RandomState(5)
    V, E, H = 30, 120, 8
    src = rng.randint(0, V, E)
    dst = np.sort(rng.randint(0, V, E))
    m = (rng.rand(E) > 0.1).astype(np.float32)
    h = rng.randn(V, H).astype(np.float32)
    w = rng.randn(E).astype(np.float32)
    srcj, dstj, mj = jnp.asarray(src), jnp.asarray(dst), jnp.asarray(m)
    zeros = jnp.zeros((V, H), jnp.float32)

    def ref(h, w):
        msgs = h[srcj] * (w * mj)[:, None]
        import jax as _jax
        return _jax.ops.segment_sum(msgs, dstj, num_segments=V)

    def loss_custom(h, w):
        return (aggregate_weighted(jnp.asarray(h), jnp.asarray(w),
                                   srcj, dstj, mj, zeros) ** 2).sum()

    def loss_ref(h, w):
        return (ref(jnp.asarray(h), jnp.asarray(w)) ** 2).sum()

    gh1, gw1 = jax.grad(loss_custom, argnums=(0, 1))(h, w)
    gh2, gw2 = jax.grad(loss_ref, argnums=(0, 1))(h, w)
    np.testing.assert_allclose(np.asarray(gh1), np.asarray(gh2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               rtol=1e-5, atol=1e-5)
