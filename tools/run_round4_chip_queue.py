"""Round-4 chip measurement queue: one command, committed records.

Runs the round-4 chip jobs SEQUENTIALLY (one host core — concurrent jobs
contaminate each other's timings; see the round-3 probe reconciliation in
docs/PERF.md) and appends one JSONL row per job to a VERSION-CONTROLLED
path (VERDICT r3 next #7 — round 3's raw records lived in /tmp-adjacent
paths and a `runs/` gitignore rule, and did not survive the session).

Jobs (each tool also writes its own runs/round4_*.json):
  1. action-vjp A/B        tools/bench_action_vjp.py      (VERDICT #3)
  2. learnable rehearsal   cli/dress_rehearsal.py --learnable (VERDICT #2)
  3. serving loop on chip  tools/bench_serving.py         (VERDICT #4)
  4. loader-fed inference  tools/bench_e2e_infer.py       (VERDICT #6)
  5. TPU export test       tests/test_export.py::...tpu   (VERDICT #4)
  6. headline bench        bench.py                       (regression gate)

Transient-tunnel failures (FAILED_PRECONDITION / remote_compile resets;
CLAUDE.md) are retried once per job.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \\
           python tools/run_round4_chip_queue.py [--only JOB ...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "runs", "round4_chip_queue.jsonl")

JOBS = [
    ("action_vjp", [sys.executable, "tools/bench_action_vjp.py"], 2400),
    # lr/epochs from the round-4 probe sweep (tools/probe_learnable.py,
    # runs/round4_learnable_probe/): lr 0.02 reached 36% val in 8 epochs and
    # was still accelerating; 15 epochs at the old lr 0.01 topped out at 28%.
    ("learnable_rehearsal",
     [sys.executable, "cli/dress_rehearsal.py", "--learnable",
      "--lr", "0.02", "--epochs", "36",
      "--out", "runs/round4_learnable"], 7200),
    ("serving", [sys.executable, "tools/bench_serving.py"], 3600),
    ("e2e_infer", [sys.executable, "tools/bench_e2e_infer.py"], 3600),
    ("tpu_export_test",
     [sys.executable, "-m", "pytest",
      "tests/test_export.py::TestServingExport::test_tpu_artifact_runs_on_chip",
      "-x", "-q"], 1200),
    ("bench", [sys.executable, "bench.py"], 3600),
]


def run_job(name, cmd, tmo):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    if name == "tpu_export_test":
        env["EHGR_TPU_TESTS"] = "1"
    for attempt in (1, 2):
        t0 = time.time()
        print(f"[queue] {name} attempt {attempt}: {' '.join(cmd)}",
              flush=True)
        try:
            res = subprocess.run(cmd, cwd=REPO, env=env, timeout=tmo,
                                 capture_output=True, text=True)
            rc = res.returncode
            tail = (res.stdout + res.stderr)[-4000:]
        except subprocess.TimeoutExpired as e:
            rc, tail = 124, f"TIMEOUT after {tmo}s: {e}"
        row = {"job": name, "attempt": attempt, "rc": rc,
               "wall_s": round(time.time() - t0, 1),
               "ts": time.strftime("%F %T"), "tail": tail[-2000:]}
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"[queue] {name} rc={rc} wall={row['wall_s']}s", flush=True)
        if rc == 0:
            return True
        time.sleep(20)
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of job names to run")
    args = ap.parse_args()
    ok = True
    for name, cmd, tmo in JOBS:
        if args.only and name not in args.only:
            continue
        ok = run_job(name, cmd, tmo) and ok
    print(f"[queue] done ok={ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
