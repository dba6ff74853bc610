"""Aggregation-kernel crossover measurement at the five recipes' REAL
compiled bucket shapes (VERDICT r3 item 4: "measure, then switch").

For each recipe's support and query buckets (B bins x P slots, E edge
budget, H = the layer's aggregated width under the matmul-order switch,
models/gcn.py:158-169), times on the real chip:

  dense    XLA batched matmul (B,P,P)@(B,P,H)      [production default]
  sized    Pallas size-aware kernel (skips dead 128-row tiles per bin fill)
  segment  edge-list gather + segment_sum (E x H messages)
  ell      ELLPACK slab gather (row_cap=16)

fwd and fwd+bwd(d/dh), f32 and bf16 for the matmul paths. Each timing is a
per-LAYER aggregation cost; the meta-train step runs it
~2*(update_step*(fwd+bwd)) times on the support bucket and a handful on the
query bucket, so the bucket that dominates wall-clock is whichever product
is larger — the table prints both.

Writes kernels.json + a markdown table to stdout.

Run (real TPU): python scripts/bench_kernels.py [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gmeta_tpu.ops.pallas_spmm import aggregate_sized  # noqa: E402
from gmeta_tpu.ops.spmm import (aggregate, aggregate_dense,  # noqa: E402
                                aggregate_ell, build_ell)

# (feat, hidden) per recipe preset (config.py PRESETS + replica feature
# widths): the spt bucket is timed at the layer-1 aggregated width
# min(feat, hidden) (the matmul-order switch aggregates the NARROW side,
# models/gcn.py:158-169), the qry bucket at hidden.
FEAT_HID = {
    "arxiv": (128, 256),
    "tissue_ppi": (50, 128),
    "fold_ppi": (512, 128),
    "firstmm_db": (5, 128),
    "tree_of_life": (1, 256),
}

# Fallback buckets for recipes without a parity record yet (the round-3
# bench's synthetic shapes). Round 4 measured at THESE for ToL/firstmm and
# the crossover never saw the flagship's real P=1024/B=20 shape (VERDICT
# r4 weak 2) — hence the parity-derived path below is the default.
FALLBACK = {
    "arxiv":      dict(spt=(1024, 9, 18432), qry=(1024, 72, 129024),
                       fill=0.93),
    "tissue_ppi": dict(spt=(1024, 6, 49152), qry=(1024, 20, 149504),
                       fill=0.90),
    "fold_ppi":   dict(spt=(1024, 9, 18432), qry=(1024, 61, 114688),
                       fill=0.90),
    "firstmm_db": dict(spt=(128, 4, 2048), qry=(128, 7, 2048), fill=0.75),
    "tree_of_life": dict(spt=(128, 14, 4096), qry=(256, 7, 4096),
                         fill=0.60),
}


def load_shapes() -> dict:
    """Bucket shapes from the runs of record (parity/<recipe>.json): the
    EXACT compiled P/B/E and measured bin fill of each production run, so
    the crossover table answers "which kernel at the shapes production
    actually compiles" (VERDICT r4 item 2)."""
    shapes = {}
    for recipe, (feat, hid) in FEAT_HID.items():
        p = os.path.join(ROOT, "parity", f"{recipe}.json")
        if os.path.exists(p):
            with open(p) as f:
                rec = json.load(f)
            b = rec["buckets"]
            shapes[recipe] = dict(
                spt=(b["P_spt"], b["B_spt"], b["E_spt"]),
                qry=(b["P_qry"], b["B_qry"], b["E_qry"]),
                H=(min(feat, hid), hid),
                fill=float(rec.get("mean_bin_fill", 0.7)),
                source="parity")
        else:
            shapes[recipe] = dict(FALLBACK[recipe], H=(min(feat, hid), hid),
                                  source="fallback")
    return shapes


def synth_bucket(P, B, E, H, fill, rng, avg_deg=10):
    """One packed bucket: B bins with ~fill*P live rows, E edges uniform
    over live slots (block-diagonal), h random."""
    sizes = np.clip((rng.normal(fill, 0.1, B) * P).astype(int), 16, P)
    A = np.zeros((B, P, P), np.float32)
    srcs, dsts = [], []
    per_bin = max(E // B, 1)
    for b in range(B):
        n = sizes[b]
        m = min(per_bin, n * avg_deg)
        s = rng.randint(0, n, m)
        d = rng.randint(0, n, m)
        A[b, d, s] += 1.0
        srcs.append(b * P + s)
        dsts.append(b * P + d)
    src = np.concatenate(srcs)[:E]
    dst = np.concatenate(dsts)[:E]
    pad = E - len(src)
    if pad:
        src = np.concatenate([src, np.zeros(pad, np.int64)])
        dst = np.concatenate([dst, np.full(pad, B * P - 1, np.int64)])
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    mask = np.ones(E, np.float32)
    mask[np.asarray(dst) == B * P - 1] = 0.0   # crude: treat pad-dst as pad
    h = rng.randn(B, P, H).astype(np.float32)
    return A, h, sizes.astype(np.int32), src.astype(np.int32), \
        dst.astype(np.int32), mask


CHAIN = 50   # dependent applications per dispatch


def chained(apply, h0, *rest):
    """One dispatch = CHAIN data-dependent applications of the kernel (the
    output feeds the next input), so per-call time is compute, not launch:
    single-call timing through the TPU tunnel is launch-bound (measured
    ~30-45 us for every kernel at every shape — including a 38-GFLOP
    matmul, i.e. not physical)."""
    def body(h, _):
        out = apply(h, *rest)
        # renormalize so 50 chained aggregations don't overflow to inf;
        # cast back: matmuls accumulate f32 regardless of input dtype
        out = (out / (1.0 + jnp.max(jnp.abs(out)))).astype(h.dtype)
        return out, None
    h, _ = jax.lax.scan(body, h0, None, length=CHAIN)
    return h


def timeit(f, *args, iters=30):
    # host fetch is the only reliable sync through the TPU tunnel —
    # block_until_ready returns early there (bench.py has the same note)
    o = f(*args)
    float(np.asarray(jnp.sum(o)))
    n = max(iters // 10, 2)
    t0 = time.time()
    for _ in range(n):
        o = f(*args)
    float(np.asarray(jnp.sum(o)))
    return (time.time() - t0) / n / CHAIN


def bench_bucket(P, B, E, H, fill, iters, rng):
    A, h, sizes, src, dst, mask = synth_bucket(P, B, E, H, fill, rng)
    out = {}
    V = B * P

    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        Ad = jnp.asarray(A, dtype)
        hd = jnp.asarray(h, dtype)
        szd = jnp.asarray(sizes)
        dense = jax.jit(lambda h, A: chained(
            lambda x, A: aggregate_dense(A, x), h, A))
        out[f"dense_{name}_fwd"] = timeit(dense, hd, Ad, iters=iters)
        if P % 128 == 0 and jax.default_backend() == "tpu":
            sized = jax.jit(lambda h, A, s: chained(
                lambda x, A, s: aggregate_sized(A, x, s), h, A, s))
            out[f"sized_{name}_fwd"] = timeit(sized, hd, Ad, szd,
                                              iters=iters)

    hf = jnp.asarray(h.reshape(V, H))
    srcd, dstd, maskd = jnp.asarray(src), jnp.asarray(dst), jnp.asarray(mask)
    seg = jax.jit(lambda h, s, d, m: chained(
        lambda x, s, d, m: aggregate(x, s, d, m, V), h, s, d, m))
    out["segment_f32_fwd"] = timeit(seg, hf, srcd, dstd, maskd, iters=iters)

    nbr, emask, row_id = build_ell(src[mask > 0], dst[mask > 0], V,
                                   row_cap=16)
    nbrd, emaskd, rowd = (jnp.asarray(nbr), jnp.asarray(emask),
                          jnp.asarray(row_id))
    ell = jax.jit(lambda h, n, m, r: chained(
        lambda x, n, m, r: aggregate_ell(x, n, m, r, V), h, n, m, r))
    out["ell_f32_fwd"] = timeit(ell, hf, nbrd, emaskd, rowd, iters=iters)
    return {k: round(v * 1e6, 1) for k, v in out.items()}   # microseconds


def global_b_ab(iters: int, rng) -> dict:
    """End-to-end sensitivity of the dense step to the split-global B
    (PACKING.md §4): time the dominant arxiv qry aggregation at the
    recorded global B vs the measured mean per-task need — the ceiling any
    bin-compaction scheme could reclaim."""
    shapes = load_shapes()
    P, B_global, E = shapes["arxiv"]["qry"]
    H = shapes["arxiv"]["H"][1]
    fill = shapes["arxiv"]["fill"]
    B_mean = 25   # measured mean per-task bin need (PACKING.md §3)
    out = {"P": P, "H": H, "B_global": B_global, "B_mean_need": B_mean}
    for tag, B in (("global", B_global), ("mean_need", B_mean)):
        A, h, sizes, *_ = synth_bucket(P, B, E, H, fill, rng)
        dense = jax.jit(lambda h, A: chained(
            lambda x, A: aggregate_dense(A, x), h, A))
        out[f"dense_f32_{tag}_us"] = round(
            timeit(dense, jnp.asarray(h), jnp.asarray(A),
                   iters=iters) * 1e6, 1)
    out["speedup_ceiling"] = round(
        out["dense_f32_global_us"] / out["dense_f32_mean_need_us"], 2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--out", default=os.path.join(ROOT, "kernels.json"))
    ap.add_argument("--global-b-ab", action="store_true",
                    help="only run the global-B sensitivity A/B and merge"
                         " the result into the existing kernels.json")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    rng = np.random.RandomState(0)

    if getattr(args, "global_b_ab"):
        ab = global_b_ab(args.iters, rng)
        existing = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                existing = json.load(f)
        existing["global_b_ab"] = ab
        with open(args.out, "w") as f:
            json.dump(existing, f, indent=1)
        print(json.dumps({"metric": "global_b_ab", **ab}))
        return

    results = {"backend": jax.default_backend(), "unit": "us_per_layer_call"}
    for recipe, cfg in load_shapes().items():
        for which, H in (("spt", cfg["H"][0]), ("qry", cfg["H"][1])):
            P, B, E = cfg[which]
            key = f"{recipe}.{which}"
            print(f"# {key}: P={P} B={B} E={E} H={H}"
                  f" [{cfg['source']}]", file=sys.stderr, flush=True)
            results[key] = dict(P=P, B=B, E=E, H=H, fill=cfg["fill"],
                                source=cfg["source"],
                                **bench_bucket(P, B, E, H, cfg["fill"],
                                               args.iters, rng))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)

    # markdown table: fastest valid kernel per bucket
    print("| bucket | dense f32 | dense bf16 | sized f32 | sized bf16 |"
          " segment | ell | winner |")
    print("|---|---|---|---|---|---|---|---|")
    for key, r in results.items():
        if not isinstance(r, dict):
            continue
        cols = ["dense_f32_fwd", "dense_bf16_fwd", "sized_f32_fwd",
                "sized_bf16_fwd", "segment_f32_fwd", "ell_f32_fwd"]
        vals = [r.get(c) for c in cols]
        winner = min((v, c) for v, c in zip(vals, cols) if v is not None)
        print("| " + key + " | "
              + " | ".join("-" if v is None else f"{v:.0f}" for v in vals)
              + f" | {winner[1].replace('_fwd', '')} |")
    print(json.dumps({"metric": "kernel_crossover", "out": args.out}))


if __name__ == "__main__":
    main()
