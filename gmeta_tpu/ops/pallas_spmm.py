"""Pallas TPU kernel: size-aware block-diagonal SpMM.

Computes out[s] = A[s, :, :] @ h[s, :, :] for the strided subgraph packing
(pack.py) where A is the (S, P, P) block-diagonal adjacency — but subgraph s
only occupies its first n_s <= P node slots, so all tiles beyond
ceil(n_s / 128) rows/columns are structurally zero.

The XLA dense path (ops/spmm.aggregate_dense) is MXU-bound at full (P, P)
blocks; real episodes mix subgraph sizes (h-hop neighborhoods of 30..1000
nodes under one P bucket, subgraph_data_processing.py:312-314), so most of
that work is padding. This kernel reads per-subgraph sizes via scalar
prefetch and:

- skips output row-tiles at or beyond n_s entirely (zero-fill),
- contracts only the first ceil(n_s / KB) column-blocks, fetching A tiles
  by manual double-buffered DMA from HBM so skipped tiles cost neither
  FLOPs nor HBM bandwidth.

Effective speedup ~ (P / n_s)^2 per subgraph. Backward (A^T @ g — the SpMM
transpose the reference gets from torch autograd, meta.py:125,149) is the
same structure contracting over rows. Both directions are registered as
first-class JAX primitives (see the registration block at the bottom) so
the MAML grad-of-grad and vmap-over-tasks compose at any order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TP = 128   # output row tile
KB = 128   # contraction block


def _fwd_kernel(sizes_ref, a_hbm, h_ref, out_ref, acc, a_buf, sem):
    """Grid (S, P // TP). out tile (TP, H) for subgraph s, rows
    [t*TP, (t+1)*TP). A tiles DMA'd (TP, KB) with double buffering."""
    s = pl.program_id(0)
    t = pl.program_id(1)
    n = sizes_ref[s]

    @pl.when(t * TP >= n)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(t * TP < n)
    def _():
        k_hi = pl.cdiv(n, KB)  # number of live column blocks

        def get_dma(slot, k):
            return pltpu.make_async_copy(
                a_hbm.at[s, pl.ds(t * TP, TP), pl.ds(k * KB, KB)],
                a_buf.at[slot],
                sem.at[slot],
            )

        acc[:] = jnp.zeros_like(acc)
        get_dma(0, 0).start()

        def body(k, _):
            slot = jax.lax.rem(k, 2)

            @pl.when(k + 1 < k_hi)
            def _():
                get_dma(1 - slot, k + 1).start()

            get_dma(slot, k).wait()
            acc[:] += jnp.dot(a_buf[slot], h_ref[0, pl.ds(k * KB, KB), :],
                              preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, k_hi, body, 0)
        out_ref[:] = acc[:].astype(out_ref.dtype)


def _bwd_kernel(sizes_ref, a_hbm, g_ref, out_ref, acc, a_buf, sem):
    """out tile = (A^T @ g) rows [t*TP, (t+1)*TP): contract over the first
    ceil(n / KB) ROW blocks of A (columns of A^T)."""
    s = pl.program_id(0)
    t = pl.program_id(1)
    n = sizes_ref[s]

    @pl.when(t * TP >= n)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(t * TP < n)
    def _():
        k_hi = pl.cdiv(n, KB)

        def get_dma(slot, k):
            return pltpu.make_async_copy(
                a_hbm.at[s, pl.ds(k * KB, KB), pl.ds(t * TP, TP)],
                a_buf.at[slot],
                sem.at[slot],
            )

        acc[:] = jnp.zeros_like(acc)
        get_dma(0, 0).start()

        def body(k, _):
            slot = jax.lax.rem(k, 2)

            @pl.when(k + 1 < k_hi)
            def _():
                get_dma(1 - slot, k + 1).start()

            get_dma(slot, k).wait()
            # (KB, TP)^T-contraction: dot_general over dim 0 x dim 0
            acc[:] += jax.lax.dot_general(
                a_buf[slot], g_ref[0, pl.ds(k * KB, KB), :],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, k_hi, body, 0)
        out_ref[:] = acc[:].astype(out_ref.dtype)


def _call(kernel, A, x, sizes, interpret):
    S, P, _ = A.shape
    H = x.shape[-1]
    # Mosaic requires the lane (last) dimension 128-aligned; narrow feature
    # widths are real (aggregated width = min(fan_in, fan_out) under the
    # matmul-order switch: 1 for Tree-of-Life's scalar feature, 5 for
    # FirstMM-DB, 50 for Tissue-PPI). Pad to the tile, slice back after.
    if H % 128:
        Hp = ((H + 127) // 128) * 128
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Hp - H)))
        return _call(kernel, A, x, sizes, interpret)[..., :H]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S, P // TP),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                # A in HBM
            pl.BlockSpec((1, P, H), lambda s, t, sz: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TP, H), lambda s, t, sz: (s, t, 0)),
        scratch_shapes=[
            pltpu.VMEM((TP, H), jnp.float32),       # accumulator
            pltpu.VMEM((2, TP, KB), A.dtype),       # DMA double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def kern(sizes_ref, a_hbm, x_ref, out_ref, acc, a_buf, sem):
        kernel(sizes_ref, a_hbm, x_ref,
               out_ref.at[0], acc, a_buf, sem)

    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, P, H), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * S * P * P * H, transcendentals=0,
            bytes_accessed=(S * P * P * A.dtype.itemsize
                            + 2 * S * P * H * x.dtype.itemsize)),
    )(sizes, A, x)


def sized_reference(A, h, sizes):
    """Pure-jax semantics of aggregate_sized (row-masked A @ h): the
    non-TPU stand-in for the production dispatch (models/gcn.py uses it
    when the backend is not TPU — pallas interpret mode does not support
    vmap+grad through scalar-prefetch calls, and the CPU test mesh needs
    the full inner loop to run). Kernel==reference equivalence is locked
    by the interpret-mode tests in tests/test_pallas.py."""
    P = A.shape[-2]
    out = jax.lax.dot_general(
        A, h, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    mask = (jnp.arange(P)[None, :] < sizes[:, None]).astype(out.dtype)
    return out * mask[..., None]


# ---- primitive registration -------------------------------------------------
#
# The op pair (A @ h, A^T @ g) is registered as first-class JAX primitives
# rather than custom_vjp functions. custom_vjp is a trace-time construct: the
# MAML INNER jax.grad consumes the wrappers, so the jaxpr it emits contains
# raw pallas_calls, and the OUTER meta-gradient's linearization then hits
# pallas's missing jvp rule (NotImplementedError — observed on the real chip
# under vmap(scan(grad)) during the parity runs; the CPU tests never saw it
# because the non-TPU path uses sized_reference). As primitives with their
# own jvp + transpose + batching rules, differentiation is closed at EVERY
# order: the op is linear in h, its tangent is itself, and its transpose is
# the other primitive of the pair — exactly how lax's own linear ops
# (e.g. conv) stay differentiable through grad-of-grad.

from jax._src import ad_util  # noqa: E402  (Zero; stable across jax 0.9)
from jax.extend import core as jex_core  # noqa: E402
from jax.interpreters import ad, batching, mlir  # noqa: E402

agg_sized_p = jex_core.Primitive("gmeta_aggregate_sized")
agg_sized_t_p = jex_core.Primitive("gmeta_aggregate_sized_t")


def aggregate_sized(A, h, sizes, interpret=False):
    """(S, P, H) = A @ h with per-subgraph live sizes; tiles at or beyond
    ceil(sizes[s]/128) are skipped (no FLOPs, no HBM reads). A is
    structural data — its cotangent is not computed (adjacency is constant
    over the inner loop; densify is not differentiated anywhere)."""
    return agg_sized_p.bind(A, h, jnp.asarray(sizes, jnp.int32),
                            interpret=bool(interpret))


def aggregate_sized_t(A, g, sizes, interpret=False):
    """(S, P, H) = A^T @ g with the same tile skipping (the SpMM transpose
    the reference gets from torch autograd, meta.py:125,149)."""
    return agg_sized_t_p.bind(A, g, jnp.asarray(sizes, jnp.int32),
                              interpret=bool(interpret))


def _register(prim, kernel, other):
    def _abstract(A, h, sizes, *, interpret):
        del interpret
        return h.update(shape=h.shape, dtype=h.dtype)

    def _impl(A, h, sizes, *, interpret):
        return _call(kernel, A, h, sizes, interpret)

    def _jvp(primals, tangents, *, interpret):
        A, h, sizes = primals
        dA, dh, _ = tangents
        if not isinstance(dA, ad_util.Zero):
            raise NotImplementedError(
                "aggregate_sized: adjacency A is structural/non-differentiable")
        out = prim.bind(A, h, sizes, interpret=interpret)
        if isinstance(dh, ad_util.Zero):
            dout = ad_util.Zero.from_primal_value(out)
        else:  # linear in h: the tangent is the op itself
            dout = prim.bind(A, dh, sizes, interpret=interpret)
        return out, dout

    def _transpose(ct, A, h, sizes, *, interpret):
        assert ad.is_undefined_primal(h) and not ad.is_undefined_primal(A)
        if isinstance(ct, ad_util.Zero):
            return None, ad_util.Zero(h.aval), None
        return None, other(A, ct, sizes, interpret=interpret), None

    def _batch(args, dims, *, interpret):
        # Fold the vmapped task axis into the subgraph axis: the kernel grid
        # is (S, P//TP), so a (T, S, ...) batch is just a (T*S, ...) call.
        A, h, sizes = args
        dA, dh, ds = dims
        T = next(a.shape[d] for a, d in zip(args, dims)
                 if d is not batching.not_mapped)

        if (dA is batching.not_mapped and ds is batching.not_mapped
                and dh is not batching.not_mapped):
            # Task-invariant adjacency: folding T into the subgraph axis
            # would materialize T full copies of A (S,P,P) in HBM. The op is
            # linear over feature columns, so fold T into H instead — one
            # bind against the SHARED A, zero copies.
            h = jnp.moveaxis(h, dh, 2)                 # (S, P, T, H)
            S, P, _, H = h.shape
            out = prim.bind(A, h.reshape(S, P, T * H), sizes,
                            interpret=interpret)
            return jnp.moveaxis(out.reshape(S, P, T, H), 2, 0), 0

        def front(x, d):
            if d is batching.not_mapped:
                return jnp.broadcast_to(x[None], (T,) + x.shape)
            return jnp.moveaxis(x, d, 0)

        A, h, sizes = front(A, dA), front(h, dh), front(sizes, ds)
        S, P = h.shape[1], h.shape[2]
        out = prim.bind(A.reshape((T * S,) + A.shape[2:]),
                        h.reshape((T * S,) + h.shape[2:]),
                        sizes.reshape(T * S), interpret=interpret)
        return out.reshape((T, S, P) + out.shape[2:]), 0

    prim.def_abstract_eval(_abstract)
    prim.def_impl(_impl)
    mlir.register_lowering(prim, mlir.lower_fun(_impl, multiple_results=False))
    ad.primitive_jvps[prim] = _jvp
    ad.primitive_transposes[prim] = _transpose
    batching.primitive_batchers[prim] = _batch


_register(agg_sized_p, _fwd_kernel,
          lambda A, g, sizes, interpret: aggregate_sized_t(A, g, sizes,
                                                           interpret))
_register(agg_sized_t_p, _bwd_kernel,
          lambda A, t, sizes, interpret: aggregate_sized(A, t, sizes,
                                                         interpret))
