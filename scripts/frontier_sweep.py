#!/usr/bin/env python
"""Walk the quality/FLOP frontier below the r4 flagship's 23.7 GFLOP/image
(VERDICT r4 item 1 — the biggest remaining lever toward the 5,000 img/s
north star).

Runs scripts/quality_gate_flagship.py once per (candidate, budget) as a
SEPARATE subprocess (one tunnel stall can only kill one cell; completed
cells are skipped on relaunch via their committed JSON), with escalating
training budgets: every candidate gates at the first budget; only FAILing
candidates advance to the next (the r4 lesson — dit_p7_d256_l6 FAILs at
12k and PASSes at 24k — made budget a recipe axis, so a FAIL at one budget
is a statement about that budget only).

The payoff table prints GFLOP/image next to each verdict: at the r4 kernel
MFU 0.36, any PASSing config <= ~17 GFLOP/image clears 4,000 img/s and
<= ~13.6 clears 5,000 (BASELINE.md north star), before any kernel gains.

  python scripts/frontier_sweep.py \
      --baseline artifacts/quality_gate_r4/quality_unet64.json \
      --out outputs/quality_gate_r5
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from bench import CHIP_PEAK_TFLOPS, dit_gflop_per_image  # noqa: E402

DEFAULT_CANDIDATES = (
    # ordered cheapest-first: the first PASS at the lowest GFLOP decides
    # the headline, so the biggest prize gates first
    "dit_p14_d256_l6",   # 4 tokens — each patch is a 14x14 quadrant
    "dit_p14_d256_l8",
    "dit_p14_d384_l6",
    "dit_p7_d192_l6_h6",  # h6 keeps head_dim 32 (kernel-aligned slices)
    "dit_p7_d256_l4",
    "dit_p7_d256_l5",
)


def cand_gflop(name: str) -> float:
    parts = {p[0]: int(p[1:]) for p in name.split("_")[1:]}
    return dit_gflop_per_image(28, parts["p"], parts["d"], parts["l"])


def gate_json(out_dir: str, cand: str, steps: int) -> str:
    suffix = "" if steps == 12000 else f"_s{steps}"
    return os.path.join(out_dir, f"quality_{cand}{suffix}.json")


def read_verdict(path: str):
    try:
        with open(path) as f:
            return json.load(f).get("verdict")
    except (OSError, ValueError):
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--candidates", default=",".join(DEFAULT_CANDIDATES))
    ap.add_argument("--budgets", default="24000,48000,96000")
    ap.add_argument("--baseline",
                    default="artifacts/quality_gate_r4/quality_unet64.json")
    ap.add_argument("--out", default="outputs/quality_gate_r5")
    ap.add_argument("--timeout", type=int, default=4800,
                    help="per-cell subprocess timeout (s); a stalled tunnel "
                         "kills one cell, not the sweep")
    ap.add_argument("--mfu", type=float, default=0.36,
                    help="measured serving MFU used for the projected "
                         "img/s column (r4 kernel floor)")
    args = ap.parse_args()

    cands = args.candidates.split(",")
    budgets = [int(b) for b in args.budgets.split(",")]
    os.makedirs(args.out, exist_ok=True)

    alive = list(cands)  # candidates still FAILing (or unrun)
    results = {}  # cand -> (budget, verdict)
    for steps in budgets:
        nxt = []
        for cand in alive:
            path = gate_json(args.out, cand, steps)
            v = read_verdict(path)
            if v is None:
                print(f"### gate {cand} @ {steps} steps", flush=True)
                cmd = [sys.executable, "scripts/quality_gate_flagship.py",
                       "--configs", cand, "--train_steps", str(steps),
                       "--baseline", args.baseline, "--out", args.out]
                try:
                    subprocess.run(cmd, timeout=args.timeout, check=False)
                except subprocess.TimeoutExpired:
                    print(f"### {cand} @ {steps}: TIMEOUT (tunnel stall?) "
                          "— cell left unrun, relaunch resumes here",
                          flush=True)
                v = read_verdict(path)
            results[cand] = (steps, v or "UNRUN")
            print(f"### {cand} @ {steps}: {v}", flush=True)
            if v != "PASS":
                nxt.append(cand)
        alive = nxt
        if not alive:
            break

    print("\n=== frontier table (MFU %.2f => projected img/s) ===" % args.mfu)
    rows = []
    for cand in cands:
        g = cand_gflop(cand)
        steps, v = results.get(cand, (None, "UNRUN"))
        proj = CHIP_PEAK_TFLOPS * 1e3 * args.mfu / g
        rows.append({"config": cand, "gflop_per_image": round(g, 2),
                     "best_budget": steps, "verdict": v,
                     "projected_images_per_sec": round(proj)})
        print(f"{cand:24s} {g:7.2f} GF/img  @{steps} {v:6s} "
              f"-> ~{proj:7.0f} img/s if PASS")
    with open(os.path.join(args.out, "frontier_table.json"), "w") as f:
        json.dump({"mfu_assumed": args.mfu, "rows": rows}, f, indent=2)
    print(f"table saved to {args.out}/frontier_table.json")


if __name__ == "__main__":
    main()
