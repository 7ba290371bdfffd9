"""One command for the round-3 chip measurement queue.

Runs, in order, on the real chip (each tool is independently re-runnable):

  1. tools/bench_e2e_train.py     — loader-fed end-to-end training rate
  2. tools/bench_int8_agreement.py — int8-vs-bf16 top-1 delta + logit cos
  3. tools/bench_cascade.py       — per-deploy-stage rates + cascade curve
  4. bench.py                     — the driver metric surface (regression check)

Appends one JSON line per result to --out (default
runs/round3_chip_queue.jsonl) so a partial run still records everything it
measured.  Use an existing synthetic tree via --tree to skip the rebuild.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/run_round3_chip_queue.py \
      [--tree /tmp/e2e_tree_xxx] [--skip e2e,agree,cascade,bench]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(name, cmd, out_path, timeout=3000):
    print(f"[queue] {name}: {' '.join(cmd)}", flush=True)
    t0 = time.perf_counter()
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout, cwd=REPO)
        last_json = None
        for line in p.stdout.splitlines():
            line = line.strip()
            if line.startswith("{") and line.endswith("}"):
                try:
                    last_json = json.loads(line)
                except json.JSONDecodeError:
                    pass
        rec = {"step": name, "rc": p.returncode,
               "wall_s": round(time.perf_counter() - t0, 1),
               "result": last_json}
        if p.returncode != 0 or last_json is None:
            rec["stderr_tail"] = p.stderr[-1500:]
    except subprocess.TimeoutExpired:
        rec = {"step": name, "rc": -1, "timeout": timeout}
    with open(out_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"[queue] {name}: rc={rec['rc']} ({rec.get('wall_s', '?')}s)",
          flush=True)
    return rec


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--tree", default="",
                   help="existing synthetic EgoGesture tree for the e2e step")
    p.add_argument("--skip", default="", help="comma list: e2e,agree,cascade,bench")
    p.add_argument("--out", default=os.path.join(REPO, "runs",
                                                 "round3_chip_queue.jsonl"))
    args = p.parse_args(argv)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    skip = set(filter(None, args.skip.split(",")))
    py = sys.executable

    recs = []
    if "e2e" not in skip:
        cmd = [py, "tools/bench_e2e_train.py", "--steps", "20",
               "--batch", "16", "--backend", "native_fast", "--workers", "2"]
        if args.tree:
            cmd += ["--tree", args.tree]
        recs.append(run("e2e_train", cmd, args.out))
    if "agree" not in skip:
        recs.append(run("int8_agreement",
                        [py, "tools/bench_int8_agreement.py"], args.out))
    if "cascade" not in skip:
        recs.append(run("cascade", [py, "tools/bench_cascade.py"], args.out))
    if "bench" not in skip:
        recs.append(run("bench", [py, "bench.py"], args.out, timeout=1800))
    ok = all(r["rc"] == 0 for r in recs)
    print(json.dumps({"queue_ok": ok, "steps": len(recs),
                      "out": args.out}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
