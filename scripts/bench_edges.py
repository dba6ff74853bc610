"""Full-graph aggregation microbench: edges/s per chip (the BASELINE.json
north-star metric for the edge-partitioned path).

Compares, on a power-law-ish synthetic graph at Tree-of-Life-like scale:
  1. edge-list segment_sum (TPU scatter-add)       — ops/spmm.aggregate
  2. ELL slab gather + short segment_sum           — ops/spmm.aggregate_ell

for one GCN aggregation forward and forward+backward, f32 and bf16.

Speed of light: aggregation must read >= E feature rows (E*H*dtype bytes,
random-access) and write V*H — at ~800 GB/s HBM that bounds edges/s at
~HBM_BW / (H * bytes). Run: python scripts/bench_edges.py [V_log2] [avg_deg]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from gmeta_tpu.ops.spmm import aggregate, aggregate_ell, build_ell


def powerlaw_graph(V, avg_deg, seed=0):
    """in-degrees ~ Zipf-capped; sources uniform. Edges sorted by dst."""
    rng = np.random.RandomState(seed)
    w = (1.0 / np.arange(1, V + 1) ** 0.8)
    w /= w.sum()
    E = V * avg_deg
    dst = rng.choice(V, size=E, p=w)
    src = rng.randint(0, V, size=E)
    order = np.argsort(dst, kind="stable")
    return src[order].astype(np.int32), dst[order].astype(np.int32)


def timeit(f, *args, iters=10):
    o = f(*args)
    jax.block_until_ready(o)
    t0 = time.time()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    return (time.time() - t0) / iters


def main():
    V = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 19)
    avg_deg = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    H = 128
    print(f"devices: {jax.devices()}", file=sys.stderr)
    src, dst = powerlaw_graph(V, avg_deg)
    E = len(src)
    deg = np.bincount(dst, minlength=V)
    print(f"V={V} E={E} H={H} max_deg={deg.max()} "
          f"p99_deg={np.percentile(deg, 99):.0f}", file=sys.stderr)

    nbr, mask, row_id = build_ell(src, dst, V, row_cap=16)
    waste = nbr.size / max(E, 1)
    print(f"ELL slabs: {nbr.shape[0]} x 16 (slot/edge ratio {waste:.2f})",
          file=sys.stderr)

    for dtype in (jnp.float32, jnp.bfloat16):
        h = jnp.asarray(np.random.RandomState(1).randn(V, H), dtype)
        srcd, dstd = jnp.asarray(src), jnp.asarray(dst)
        em = jnp.ones(E, dtype)
        nbrd, maskd = jnp.asarray(nbr), jnp.asarray(mask).astype(dtype)
        rid = jnp.asarray(row_id)

        seg = jax.jit(lambda h: aggregate(h, srcd, dstd, em, V))
        ell = jax.jit(lambda h: aggregate_ell(h, nbrd, maskd, rid, V))

        # correctness cross-check
        a = np.asarray(seg(h), np.float32)
        b = np.asarray(ell(h), np.float32)
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
        print(f"{dtype.__name__}: rel err seg-vs-ell = {err:.2e}")

        for name, f in (("segsum", seg), ("ell", ell)):
            t = timeit(f, h)
            print(f"{dtype.__name__} {name:7s} fwd: {t*1e3:8.2f} ms  "
                  f"{E/t/1e9:6.2f} Ge/s")
            g = jax.jit(jax.grad(lambda x: (f(x) ** 2).sum().astype(jnp.float32)))
            tg = timeit(g, h)
            print(f"{dtype.__name__} {name:7s} f+b: {tg*1e3:8.2f} ms  "
                  f"{E/tg/1e9:6.2f} Ge/s")


if __name__ == "__main__":
    main()
