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
same structure contracting over rows, wired via custom_vjp.
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
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S, P // TP),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),             # A in HBM
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def aggregate_sized(A, h, sizes, interpret=False):
    """(S, P, H) = A @ h with per-subgraph live sizes; tiles beyond
    ceil(sizes[s]/128) are skipped (no FLOPs, no HBM reads). A is
    non-differentiable data (edge structure).

    Differentiable to ANY order: the op is linear in h, and its vjp is the
    transpose kernel wrapped in its own custom_vjp whose vjp is this
    function again (mutual recursion). Without that, the MAML outer grad —
    which differentiates THROUGH the inner loop's vjp (the prototype path)
    — would hit the raw pallas_call behind a one-shot custom_vjp and fail
    with the pallas jvp NotImplementedError."""
    return _call(_fwd_kernel, A, h, sizes, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def aggregate_sized_t(A, g, sizes, interpret=False):
    """(S, P, H) = A^T @ g with the same tile skipping (the SpMM transpose
    the reference gets from torch autograd, meta.py:125,149)."""
    return _call(_bwd_kernel, A, g, sizes, interpret)


def _fwd(A, h, sizes, interpret):
    return _call(_fwd_kernel, A, h, sizes, interpret), (A, sizes)


def _bwd(interpret, res, g):
    A, sizes = res
    return (None, aggregate_sized_t(A, g, sizes, interpret), None)


def _fwd_t(A, g, sizes, interpret):
    return _call(_bwd_kernel, A, g, sizes, interpret), (A, sizes)


def _bwd_t(interpret, res, t):
    A, sizes = res
    return (None, aggregate_sized(A, t, sizes, interpret), None)


aggregate_sized.defvjp(_fwd, _bwd)
aggregate_sized_t.defvjp(_fwd_t, _bwd_t)
