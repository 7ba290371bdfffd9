"""Collect the MTMM depth-aux ablation report from on-disk run records.

``tools/ablate_mtmm.py`` writes per-run ``metrics.jsonl`` under
``<out>/synthetic/{BASELINE,MTMM}/<ts>_<arch>_s<seed>/``; this tool
synthesizes the cross-seed report from those records (used when the
in-process aggregation was lost — the round-5 queue crash killed the
parent after seeds 0-1 finished — or to re-derive the report later).

Note on grading: seeds run before/after the hard-only-eval change
(``data/factory.py``) grade val on different distributions (mixture vs
K-distractor-only); per-seed deltas compare arms under the SAME grading,
so the delta column is internally consistent, but absolute top-1 is not
comparable across such seeds.  The report records best val top-1 per arm.

  PYTHONPATH=/root/repo python tools/collect_ablation.py \
      [--out runs/round5_ablation]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import time

import numpy as np


def best_top1(run_dir: str) -> float:
    best = -1.0
    path = os.path.join(run_dir, "metrics.jsonl")
    for line in open(path):
        best = max(best, float(json.loads(line).get("val_final_top1", -1)))
    return round(best, 2)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="runs/round5_ablation")
    args = p.parse_args(argv)

    rows = {}
    for stage, arch in (("BASELINE", "tsn"), ("MTMM", "tsn_mtmm")):
        for d in sorted(glob.glob(
                os.path.join(args.out, "synthetic", stage, "*"))):
            m = re.search(rf"_{arch}_s(\d+)$", d.rstrip("/"))
            if not m:
                continue
            seed = int(m.group(1))
            rows.setdefault(seed, {"seed": seed})[f"{arch}_top1"] = \
                best_top1(d)

    runs = []
    for seed in sorted(rows):
        r = rows[seed]
        if "tsn_top1" in r and "tsn_mtmm_top1" in r:
            r["delta"] = round(r["tsn_mtmm_top1"] - r["tsn_top1"], 2)
            runs.append(r)

    deltas = np.array([r["delta"] for r in runs], np.float64)
    out = {"tool": "collect_ablation", "ts": time.strftime("%F %T"),
           "runs": runs,
           "mean_delta": round(float(deltas.mean()), 2) if runs else None,
           "std_delta": round(float(deltas.std()), 2) if runs else None,
           "depth_aux_helps": bool(deltas.mean() > 0) if runs else None}
    with open(os.path.join(args.out, "ablation_report.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
