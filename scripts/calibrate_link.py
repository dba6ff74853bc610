"""Train-in-the-loop calibration of the link-prediction replicas
(firstmm_db, tree_of_life) — VERDICT r4 item 4: firstmm_db sits at 0.734
vs the 0.769/0.756 reference band and never got the production-driver
calibration that fixed fold and arxiv (its knobs were set by the numpy
proxy that under-shot fold twice).

For each candidate of the feature-noise knob (and optionally the activity-
assortativity beta), regenerate the full-scale replica, train it through
the production driver, and pick the knob that lands the accuracy at the
reference target. firstmm_db's full preset is cheap enough (22.5k tasks at
~250 tasks/s) that probes run the WHOLE schedule — no probe-vs-full
extrapolation error.

Usage: python scripts/calibrate_link.py firstmm_db --noises 0.30,0.22,0.15
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

import make_replicas  # noqa: E402
import run_parity  # noqa: E402

TARGETS = {"firstmm_db": 0.769, "tree_of_life": 0.694}


def probe_once(recipe: str, noise: float, beta: float, out_dir: str,
               full: bool = True, keep_replica: bool = False) -> dict:
    tag = f"{recipe}_n{noise:.2f}_b{beta:.2f}"
    rep_root = os.path.join(out_dir, tag)
    rep = os.path.join(rep_root, recipe)
    if not os.path.exists(os.path.join(rep, "graphs.npz")):
        print(f"# generating {recipe} replica noise={noise} beta={beta}",
              flush=True)
        if recipe == "firstmm_db":
            make_replicas._link_recipe(
                rep, n_graphs=41, n=1_350, feat_dim=5, local_k=1,
                hub_deg=4.0, seed=3, feature_kind="structural",
                noise=noise, beta=beta, z_win=32)
        else:
            make_replicas._link_recipe(
                rep, n_graphs=1_840, n=2_900, feat_dim=1, local_k=3,
                hub_deg=7.5, seed=4, feature_kind="degree",
                noise=noise, beta=beta, z_win=32)
    args = argparse.Namespace(
        probe=not full, epoch=0, batchsz=0, eval_batchsz=0, agg="",
        dtype="", remat=False, device_task_pool=True, checkpoint=False,
        task_n=None, tag="", replicas=rep_root,
        out=os.path.join(out_dir, f"res_{tag}"))
    res = run_parity.run_recipe(recipe, args)
    if not keep_replica:
        shutil.rmtree(rep, ignore_errors=True)
    return res


def main():
    ap = argparse.ArgumentParser("calibrate_link")
    ap.add_argument("recipe", choices=list(TARGETS))
    ap.add_argument("--noises", default="0.30,0.22,0.15")
    ap.add_argument("--betas", default="2.5")
    ap.add_argument("--probe", action="store_true",
                    help="truncated probe runs instead of the full preset")
    ap.add_argument("--out", default=os.path.join(ROOT, "parity_cal"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    target = TARGETS[args.recipe]
    rows = []
    for b in [float(x) for x in args.betas.split(",")]:
        for n in [float(x) for x in args.noises.split(",")]:
            res = probe_once(args.recipe, n, b, args.out,
                             full=not args.probe)
            a = res["acc"]
            rows.append({"noise": n, "beta": b,
                         "final": a["test_acc_final_step"],
                         "best": a["best_model_acc"],
                         "ref_style": a["test_acc_ref_style"]})
            print(f"# noise={n} beta={b}: final"
                  f" {a['test_acc_final_step']:.3f} (target {target})",
                  flush=True)

    with open(os.path.join(args.out, f"{args.recipe}_sweep.json"),
              "w") as f:
        json.dump({"target": target, "rows": rows}, f, indent=1)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
