#!/usr/bin/env python
"""Regenerate the compositional-generalization results table from the
archived eval reports (artifacts/*/compositional_eval_*.json, or any
directories passed on the CLI). Prints GitHub-flavored markdown sorted by
held-out joint accuracy so the README tables stay consistent with the JSON
evidence the grids sit next to."""

import argparse
import glob
import json
import os


def rows_from(path):
    with open(path) as f:
        rep = json.load(f)
    run = os.path.relpath(path).split("/")[1]  # artifacts/<run>/...
    for tag, op in rep.get("ops", {}).items():
        yield {
            "dataset": rep.get("dataset", "?"),
            "run": run,
            "op": tag,
            "weights": op.get("weights"),
            "seen": op.get("seen_joint_acc", float("nan")),
            "held_out": op.get("heldout_joint_acc", float("nan")),
            "cells": "",
            "source": os.path.relpath(path),
        }
    # holdout-sweep reports (compositional_sweep_*.json): one row per
    # operator with mean held-out joint accuracy and the min-max range
    # across cells (single-cell rankings are single-sample claims)
    for tag, agg in rep.get("aggregate", {}).items():
        yield {
            "dataset": rep.get("dataset", "?"),
            "run": run,
            "op": tag,
            "weights": None,
            "seen": agg["seen_joint_acc_mean"],
            "held_out": agg["heldout_joint_acc_mean"],
            "cells": (f" ({agg['heldout_joint_acc_min']:.2f}-"
                      f"{agg['heldout_joint_acc_max']:.2f}, "
                      f"n={agg['n_cells']})"),
            "source": os.path.relpath(path),
        }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dirs", nargs="*", default=None,
                    help="report dirs (default: artifacts/*)")
    ap.add_argument("--dataset", default=None,
                    help="filter: shapes | colored_mnist")
    ap.add_argument("--top", type=int, default=0,
                    help="only the N best held-out rows (0 = all)")
    args = ap.parse_args()

    pats = args.dirs or ["artifacts/*"]
    rows = []
    for pat in pats:
        # both report generations: tagged (compositional_eval_<ds>_<ops>.json)
        # and the earlier untagged compositional_eval.json
        paths = (glob.glob(os.path.join(pat, "compositional_eval_*.json"))
                 + glob.glob(os.path.join(pat, "compositional_eval.json"))
                 + glob.glob(os.path.join(pat, "compositional_sweep_*.json")))
        for path in sorted(paths):
            rows.extend(rows_from(path))
    if args.dataset:
        rows = [r for r in rows if r["dataset"] == args.dataset]
    rows.sort(key=lambda r: (-r["held_out"], -r["seen"]))
    if args.top:
        rows = rows[: args.top]

    print("| dataset | run (recipe) | operator | held-out joint | "
          "seen joint | report |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['dataset']} | {r['run']} | {r['op']} "
              f"| {r['held_out']:.3f}{r['cells']} | {r['seen']:.3f} "
              f"| {r['source']} |")


if __name__ == "__main__":
    main()
