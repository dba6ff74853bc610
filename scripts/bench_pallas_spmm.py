"""Microbench: Pallas size-aware SpMM (ops/pallas_spmm.aggregate_sized)
vs the XLA dense path (ops/spmm.aggregate_dense) on the real TPU chip,
at episode-realistic shapes (mixed subgraph sizes under one P bucket).

Run: python scripts/bench_pallas_spmm.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from gmeta_tpu.ops.pallas_spmm import aggregate_sized
from gmeta_tpu.ops.spmm import aggregate_dense


def mk(S, P, H, sizes, dtype, seed=0):
    rng = np.random.RandomState(seed)
    A = np.zeros((S, P, P), np.float32)
    for s in range(S):
        n = sizes[s]
        deg = 8
        for i in range(n):
            js = rng.randint(0, n, deg)
            A[s, i, js] = 1.0
    h = rng.randn(S, P, H).astype(np.float32)
    return (jnp.asarray(A, dtype), jnp.asarray(h, dtype),
            jnp.asarray(np.asarray(sizes), jnp.int32))


def timeit(f, *args, iters=20):
    o = f(*args)
    _ = float(jnp.asarray(o).sum())  # sync (tunnel-safe)
    t0 = time.time()
    for _ in range(iters):
        o = f(*args)
    _ = float(jnp.asarray(o).sum())
    return (time.time() - t0) / iters


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    S, P, H = 21, 1024, 256
    rng = np.random.RandomState(1)
    sizes = rng.randint(40, 1000, S)

    for dtype in (jnp.float32, jnp.bfloat16):
        A, h, sz = mk(S, P, H, sizes, dtype)

        dense = jax.jit(aggregate_dense)
        pall = jax.jit(lambda A, h, sz: aggregate_sized(A, h, sz))

        # correctness
        od = np.asarray(dense(A, h), np.float32)
        op = np.asarray(pall(A, h, sz), np.float32)
        # dense path doesn't mask beyond n; kernel zero-fills there. Compare
        # only live rows.
        errs = []
        for s in range(S):
            n = int(sizes[s])
            errs.append(np.abs(od[s, :n] - op[s, :n]).max())
        print(f"{dtype.__name__}: max fwd err (live rows) = {max(errs):.3e}")

        # grads
        def ld(A, h):
            return (aggregate_dense(A, h) ** 2).sum()

        def lp(A, h, sz):
            return (aggregate_sized(A, h, sz) ** 2).sum()

        gd = np.asarray(jax.jit(jax.grad(ld, argnums=1))(A, h), np.float32)
        gp = np.asarray(jax.jit(jax.grad(lp, argnums=1))(A, h, sz), np.float32)
        gerrs = [np.abs(gd[s, :int(sizes[s])] - gp[s, :int(sizes[s])]).max()
                 for s in range(S)]
        print(f"{dtype.__name__}: max bwd err (live rows) = {max(gerrs):.3e}")

        td = timeit(dense, A, h)
        tp = timeit(pall, A, h, sz)
        print(f"{dtype.__name__}: dense {td*1e3:.3f} ms  pallas {tp*1e3:.3f} ms"
              f"  speedup {td/tp:.2f}x")

        tdg = timeit(jax.jit(jax.grad(ld, argnums=1)), A, h)
        tpg = timeit(jax.jit(jax.grad(lp, argnums=1)), A, h, sz)
        print(f"{dtype.__name__}: grad dense {tdg*1e3:.3f} ms  pallas "
              f"{tpg*1e3:.3f} ms  speedup {tdg/tpg:.2f}x")


if __name__ == "__main__":
    main()
