"""MTMM depth-aux ablation on the learnable task (VERDICT r4 next #2).

The reference's core claim is that the next-segment depth auxiliary loss
improves top-1 (+0.67 on EgoGesture: 94.53 -> 95.20, BASELINE.md rows 1-2;
loss at ``/root/reference/train_mtmm.py:223-231``).  This tool trains, at
IDENTICAL budget/geometry/seed, the plain baseline (arch ``tsn``, CE only)
vs the MTMM model (arch ``tsn_mtmm``, CE + 0.01*MSE on next-segment depth)
on the hard learnable task — where the target-only depth stream is
genuinely selection-informative — over >=3 seeds, and reports the per-seed
and mean top-1 delta.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate_mtmm.py \
      --epochs 16 --seeds 0 1 2 [--out runs/round5_ablation]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torch  # noqa: F401  (torch before jax; CLAUDE.md)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--lr", type=float, default=0.02)
    p.add_argument("--epochs", type=int, default=16)
    p.add_argument("--videos", type=int, default=512)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--classes", type=int, default=16)
    p.add_argument("--crop", type=int, default=64)
    p.add_argument("--clip_len", type=int, default=8)
    p.add_argument("--task", default="motion_hard",
                   choices=["motion", "motion_hard"])
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    # shared warm-start for BOTH arms (round 5): from scratch the hard
    # task gives a final-head-only model no gradient signal at all
    # (runs/round5_probe MTMM flat at chance for 36 epochs), so a
    # scratch-vs-scratch delta would measure noise.  The reference's two
    # arms both start from ImageNet (models/models.py pretrained=
    # 'imagenet'); here both start from the rehearsal's easy-task
    # stage-0 checkpoint — the same init, non-strictly absorbed (the
    # 'tsn' arm simply drops the depth decoder leaves).
    p.add_argument("--init", default="",
                   help="checkpoint dir both arms warm-start from")
    p.add_argument("--out", default="runs/round5_ablation")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ehgr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from ehgr_tpu.configs import (Config, DataConfig, ModelConfig,
                                  OptimConfig, RunConfig)
    from ehgr_tpu.data.factory import build_train_datasets
    from ehgr_tpu.train.loop import run_training

    def cfg(arch, seed):
        return Config(
            data=DataConfig(dataset="synthetic", backend="synthetic",
                            synthetic_task=args.task,
                            synthetic_videos=args.videos,
                            clip_len=args.clip_len, batch_size=args.batch,
                            num_classes=args.classes, crop_size=args.crop,
                            scale_size=args.crop + 32, clip_num=2,
                            num_workers=2),
            model=ModelConfig(arch=arch, num_segments=args.clip_len,
                              num_classes=args.classes, partial_bn=False),
            optim=OptimConfig(lr=args.lr, epochs=args.epochs,
                              lr_steps=(max(args.epochs * 2 // 3, 1),),
                              ema_decay=0.999),
            run=RunConfig(run_dir=args.out, seed=seed, ckpt_light=True,
                          checkpoint_path=args.init,
                          model_name=f"{arch}_s{seed}", display=8),
        ).validate()

    runs = []
    for seed in args.seeds:
        row = {"seed": seed}
        for arch, stage in (("tsn", "baseline"), ("tsn_mtmm", "mtmm")):
            c = cfg(arch, seed)
            t0 = time.perf_counter()
            res = run_training(c, stage, *build_train_datasets(c, stage))
            row[f"{arch}_top1"] = round(float(res["best_top1"]), 2)
            row[f"{arch}_wall_s"] = round(time.perf_counter() - t0, 1)
        row["delta"] = round(row["tsn_mtmm_top1"] - row["tsn_top1"], 2)
        runs.append(row)
        print(json.dumps(row), flush=True)

    deltas = np.array([r["delta"] for r in runs], np.float64)
    out = {"tool": "ablate_mtmm", "ts": time.strftime("%F %T"),
           "init": args.init,
           "task": args.task, "lr": args.lr, "epochs": args.epochs,
           "videos": args.videos, "batch": args.batch,
           "classes": args.classes, "crop": args.crop,
           "runs": runs,
           "mean_delta": round(float(deltas.mean()), 2),
           "std_delta": round(float(deltas.std()), 2),
           "depth_aux_helps": bool(deltas.mean() > 0)}
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "ablation_report.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
