"""Round-5 chip measurement queue: one command, committed records.

Runs the round-5 chip jobs SEQUENTIALLY (one host core — concurrent jobs
contaminate timings; docs/PERF.md round-3 reconciliation) and appends one
JSONL row per job to a version-controlled path.

Jobs (each tool also writes its own runs/round5_* record):
  1. hard-task rehearsal   cli/dress_rehearsal.py --learnable --task
                           motion_hard            (VERDICT r4 next #1)
  2. MTMM ablation x3 seeds tools/ablate_mtmm.py  (VERDICT r4 next #2)
  3. int8 agreement on the TRAINED ckpt            (VERDICT r4 next #3)
  4. cascade curve on the TRAINED ckpt             (VERDICT r4 next #3)
  5. headline bench (now with MFU/roofline rows)   (VERDICT r4 next #4)

Jobs 3-4 locate the newest stage-2 best checkpoint under
runs/round5_learnable/synthetic/SD/*/ automatically.

Transient-tunnel failures (FAILED_PRECONDITION / remote_compile resets;
CLAUDE.md) are retried once per job.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \\
           python tools/run_round5_chip_queue.py [--only JOB ...] \\
           [--epochs 40] [--sd_epochs 40] [--ablate_epochs 16] [--lr 0.02]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "runs", "round5_chip_queue.jsonl")


def newest_sd_ckpt():
    cands = sorted(glob.glob(os.path.join(
        REPO, "runs", "round5_learnable", "synthetic", "SD", "*",
        "rehearsal_best_ckpt")))
    return cands[-1] if cands else ""


def newest_pretrain_ckpt():
    cands = sorted(glob.glob(os.path.join(
        REPO, "runs", "round5_learnable", "synthetic", "MTMM", "*",
        "rehearsal_pre_best_ckpt")))
    return cands[-1] if cands else ""


def run_job(name, cmd, tmo):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    for attempt in (1, 2):
        t0 = time.time()
        try:
            r = subprocess.run(cmd, cwd=REPO, env=env, timeout=tmo,
                               capture_output=True, text=True)
            rc = r.returncode
        except subprocess.TimeoutExpired:
            rc, r = -9, None
        row = {"job": name, "attempt": attempt, "rc": rc,
               "wall_s": round(time.time() - t0, 1),
               "ts": time.strftime("%F %T"),
               "tail": (r.stdout[-2500:] if r else "TIMEOUT")}
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"[queue] {name} attempt {attempt}: rc={rc} "
              f"({row['wall_s']}s)", flush=True)
        if rc == 0:
            return True
        if r is not None and "FAILED_PRECONDITION" not in (
                r.stdout + r.stderr):
            return False  # real failure, no point retrying
    return False


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--only", nargs="*", default=None)
    p.add_argument("--lr", type=float, default=0.02)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--sd_epochs", type=int, default=0)
    p.add_argument("--ablate_epochs", type=int, default=16)
    p.add_argument("--pretrain_epochs", type=int, default=20)
    p.add_argument("--videos", type=int, default=512)
    p.add_argument("--ablate_videos", type=int, default=0,
                   help="override ablation train-set size (0 = --videos)")
    args = p.parse_args(argv)
    py = sys.executable

    jobs = [
        ("rehearsal",
         [py, "cli/dress_rehearsal.py", "--learnable",
          "--task", "motion_hard", "--lr", str(args.lr),
          "--epochs", str(args.epochs),
          "--sd_epochs", str(args.sd_epochs or args.epochs),
          "--pretrain_epochs", str(args.pretrain_epochs),
          "--videos", str(args.videos),
          "--out", "runs/round5_learnable"], 14000),
    ]
    # jobs needing the trained checkpoint are appended lazily; the
    # stage-1 plateau probe (VERDICT r4 weak #4) runs last, least critical
    late = ["int8_agreement", "cascade", "bench", "mtmm_plateau"]

    names = [j[0] for j in jobs] + ["ablation"] + late
    only = set(args.only or names)

    for name, cmd, tmo in jobs:
        if name in only:
            run_job(name, cmd, tmo)

    if "ablation" in only:
        # both arms warm-start from the rehearsal's stage-0 easy-task
        # checkpoint (the ImageNet proxy; see tools/ablate_mtmm.py)
        pre = newest_pretrain_ckpt()
        run_job("ablation",
                [py, "tools/ablate_mtmm.py", "--lr", str(args.lr),
                 "--epochs", str(args.ablate_epochs),
                 "--videos", str(args.ablate_videos or args.videos),
                 "--init", pre,
                 "--out", "runs/round5_ablation"], 14000)

    ckpt = newest_sd_ckpt()
    if "int8_agreement" in only:
        if ckpt:
            run_job("int8_agreement",
                    [py, "tools/bench_int8_agreement.py",
                     "--checkpoint", ckpt, "--task", "motion_hard",
                     "--crop", "64", "--classes", "16",
                     "--videos", str(args.videos), "--clip_num", "2"], 5400)
        else:
            print("[queue] int8_agreement skipped: no SD ckpt", flush=True)
    if "cascade" in only:
        if ckpt:
            run_job("cascade",
                    [py, "tools/bench_cascade.py",
                     "--checkpoint", ckpt, "--task", "motion_hard",
                     "--crop", "64", "--classes", "16",
                     "--videos", str(args.videos), "--clip_num", "2",
                     "--batch", "256"], 7200)
        else:
            print("[queue] cascade skipped: no SD ckpt", flush=True)
    if "bench" in only:
        run_job("bench", [py, "bench.py"], 5400)
    if "mtmm_plateau" in only:
        # VERDICT r4 weak #4: was the round-4 MTMM 53.9% plateau (36 ep,
        # EASY task) budget or bug?  Extend stage 1 alone to 2x the budget.
        run_job("mtmm_plateau",
                [py, "tools/probe_learnable.py", "--task", "motion",
                 "--lr", "0.02", "--epochs", "72",
                 "--videos", "512",
                 "--out", "runs/round5_learnable_probe"], 10000)


if __name__ == "__main__":
    main()
