"""MTMM-stage LR/epoch probe for the learnable synthetic task (VERDICT r3
next #2 tuning).

The round-4 first attempt trained the learnable task at lr=0.01 for 15
epochs and reached only 28% val top-1 (trending up) — under-trained, not
broken.  Before spending an hour of chip time on the full two-stage proof,
this probes stage 1 alone at a given lr/epoch budget and prints the whole
val curve so the full run's budget is chosen from evidence.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_learnable.py \
      --lr 0.02 --epochs 8 [--videos 512] [--out runs/round4_learnable_probe]
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
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--videos", type=int, default=512)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--classes", type=int, default=16)
    p.add_argument("--crop", type=int, default=64)
    p.add_argument("--clip_len", type=int, default=8)
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument("--task", default="motion",
                   choices=["motion", "motion_hard"])
    p.add_argument("--out", default="runs/round4_learnable_probe")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ehgr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ehgr_tpu.configs import (Config, DataConfig, ModelConfig,
                                  OptimConfig, RunConfig)
    from ehgr_tpu.data.factory import build_train_datasets
    from ehgr_tpu.train.loop import run_training

    tag = f"{args.task}_lr{args.lr}_e{args.epochs}_do{args.dropout}"
    cfg = Config(
        data=DataConfig(dataset="synthetic", backend="synthetic",
                        synthetic_task=args.task,
                        synthetic_videos=args.videos,
                        clip_len=args.clip_len, batch_size=args.batch,
                        num_classes=args.classes, crop_size=args.crop,
                        scale_size=args.crop + 32, clip_num=2,
                        num_workers=2),
        model=ModelConfig(arch="tsn_mtmm", num_segments=args.clip_len,
                          num_classes=args.classes, partial_bn=False,
                          dropout=args.dropout),
        optim=OptimConfig(lr=args.lr, epochs=args.epochs,
                          lr_steps=(max(args.epochs * 2 // 3, 1),),
                          ema_decay=0.999),
        run=RunConfig(run_dir=args.out, model_name=tag, display=8,
                      ckpt_light=True),
    ).validate()

    t0 = time.perf_counter()
    res = run_training(cfg, "mtmm", *build_train_datasets(cfg, "mtmm"))
    wall = time.perf_counter() - t0

    # pull the per-epoch val curve back out of the run's metrics log
    curve = []
    mpath = os.path.join(res["run_dir"], "metrics.jsonl")
    if os.path.isfile(mpath):
        for line in open(mpath):
            r = json.loads(line)
            curve.append(round(float(r.get("val_final_top1", -1)), 2))

    out = {"tool": "probe_learnable", "ts": time.strftime("%F %T"),
           "lr": args.lr, "epochs": args.epochs, "videos": args.videos,
           "batch": args.batch, "classes": args.classes,
           "dropout": args.dropout, "wall_s": round(wall, 1),
           "s_per_epoch": round(wall / max(args.epochs, 1), 1),
           "best_top1": round(float(res["best_top1"]), 2),
           "final_train_loss": round(float(res["final_train_loss"]), 4),
           "val_curve": curve}
    print(json.dumps(out))
    with open(os.path.join(args.out, f"probe_{tag}.json"), "w") as f:
        json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    main()
