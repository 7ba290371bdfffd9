"""Protocol-scale dress rehearsal on the real chip (one command).

Runs the full two-stage recipe at the reference's PROTOCOL geometry —
224^2 / T=8 / batch>=32 (the reference's headline configs,
``train_mtmm.py:469-471`` + ``train_sd.py`` stage 2) — on the synthetic
backend, end to end on whatever device JAX has (the TPU under the driver):

  stage 1: train_mtmm, a few steps    (CE + 0.01*MSE depth)
  transfer: non-strict checkpoint load (SD init'd from MTMM best)
  stage 2: train_sd, a few steps      (KD T=3 + hint losses)
  test:    multi-clip 4-head protocol (clip_num votes per video)

The CPU-mesh e2e suite runs the same flow at 32^2/T=4; this rehearsal exists
to catch HBM/layout/compile issues only protocol shapes expose.

  python cli/dress_rehearsal.py [--batch 32] [--steps 3] [--out runs/rehearsal]

Prints ONE JSON line with losses, accuracies and measured step rates.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torch  # noqa: F401  (import torch before jax: see CLAUDE.md)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--clip_len", type=int, default=8)
    p.add_argument("--crop", type=int, default=224)
    p.add_argument("--classes", type=int, default=83)
    p.add_argument("--out", default="")
    p.add_argument("--action_fused", default="",
                   help="'' (XLA) | 'mega' inference kernel mode")
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    import numpy as np

    from ehgr_tpu.configs import (Config, DataConfig, ModelConfig,
                                  OptimConfig, RunConfig)
    from ehgr_tpu.data.factory import build_train_datasets
    from ehgr_tpu.eval.runner import run_test
    from ehgr_tpu.train.loop import run_training

    out_dir = args.out or tempfile.mkdtemp(prefix="rehearsal_")

    def cfg(arch, **run_kw):
        run_kw.setdefault("display", 1)
        return Config(
            data=DataConfig(dataset="synthetic", backend="synthetic",
                            clip_len=args.clip_len, batch_size=args.batch,
                            num_classes=args.classes, crop_size=args.crop,
                            scale_size=args.crop + 32, clip_num=2,
                            num_workers=2),
            model=ModelConfig(arch=arch, num_segments=args.clip_len,
                              num_classes=args.classes, partial_bn=False,
                              action_fused=args.action_fused or None),
            optim=OptimConfig(lr=0.002, epochs=1, lr_steps=(100,),
                              ema_decay=0.999),
            run=RunConfig(run_dir=out_dir, model_name="rehearsal", **run_kw),
        ).validate()

    report = {"batch": args.batch, "clip_len": args.clip_len,
              "crop": args.crop, "classes": args.classes}

    # stage 1: MTMM ------------------------------------------------------
    c1 = cfg("tsn_mtmm")
    t0 = time.perf_counter()
    res1 = run_training(c1, "mtmm", *build_train_datasets(c1, "mtmm"),
                        max_steps_per_epoch=args.steps)
    report["mtmm_wall_s"] = round(time.perf_counter() - t0, 1)
    report["mtmm_loss"] = round(float(res1["final_train_loss"]), 4)
    assert np.isfinite(res1["final_train_loss"]), "MTMM loss diverged"
    best = os.path.join(res1["run_dir"], "rehearsal_best_ckpt")
    assert os.path.isdir(best), "no stage-1 checkpoint written"

    # stage 2: SD, init'd non-strict from the MTMM checkpoint ------------
    c2 = cfg("tsn_sd", checkpoint_path=best)
    t0 = time.perf_counter()
    res2 = run_training(c2, "sd", *build_train_datasets(c2, "sd"),
                        max_steps_per_epoch=args.steps)
    report["sd_wall_s"] = round(time.perf_counter() - t0, 1)
    report["sd_loss"] = round(float(res2["final_train_loss"]), 4)
    assert np.isfinite(res2["final_train_loss"]), "SD loss diverged"

    # test protocol: multi-clip, 4 heads, on the stage-2 weights ---------
    best2 = os.path.join(res2["run_dir"], "rehearsal_best_ckpt")
    assert os.path.isdir(best2), "no stage-2 checkpoint written"
    c3 = cfg("tsn_sd", checkpoint_path=best2)
    t0 = time.perf_counter()
    res3 = run_test(c3, arch="tsn_sd", heads=4)
    report["test_wall_s"] = round(time.perf_counter() - t0, 1)
    for k in ("final", "mid1", "mid2", "mid3"):
        report[f"{k}_top1"] = round(float(res3[f"{k}_top1"]), 2)
    report["n_videos"] = int(res3["n_videos"])
    report["ok"] = True

    if not args.out:
        shutil.rmtree(out_dir, ignore_errors=True)
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
