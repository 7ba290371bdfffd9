"""Exit-separation probe for the hardened learnable task (VERDICT r4 #1).

Question: does a candidate synthetic-task difficulty produce the
reference's strict SD exit ladder (mid1 < mid2 < mid3 <= final — the
90.62/91.92/94.96/95.26 shape of
``/root/reference/runs/EgoGesture/SD/2023-5-29-20-54-41_*/test.log:4``)
instead of the round-4 saturation (all heads ~100)?

Trains tsn_sd FROM SCRATCH (no MTMM init — the cheap proxy; the full
recipe proof is ``cli/dress_rehearsal.py --learnable``) on the task built
with the given knobs and prints the per-epoch val curve of all four heads.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_exits.py \
      --epochs 12 [--videos 512] [--distractors 2] [--occlude 0] \
      [--noise 96] [--hard/--no-hard] [--out runs/round5_probe]
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
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--videos", type=int, default=512)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--classes", type=int, default=16)
    p.add_argument("--crop", type=int, default=64)
    p.add_argument("--clip_len", type=int, default=8)
    p.add_argument("--distractors", type=int, default=2)
    p.add_argument("--occlude", type=int, default=0)
    p.add_argument("--noise", type=int, default=96)
    p.add_argument("--hard", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--out", default="runs/round5_probe")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ehgr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ehgr_tpu.configs import (Config, DataConfig, ModelConfig,
                                  OptimConfig, RunConfig)
    from ehgr_tpu.data.synthetic import LearnableClipSource
    from ehgr_tpu.train.loop import run_training

    tag = (f"sd_e{args.epochs}_d{args.distractors}_o{args.occlude}"
           f"_n{args.noise}_{'hard' if args.hard else 'easy'}")
    cfg = Config(
        data=DataConfig(dataset="synthetic", backend="synthetic",
                        synthetic_task="motion_hard",
                        synthetic_videos=args.videos,
                        clip_len=args.clip_len, batch_size=args.batch,
                        num_classes=args.classes, crop_size=args.crop,
                        scale_size=args.crop + 32, clip_num=2,
                        num_workers=2),
        model=ModelConfig(arch="tsn_sd", num_segments=args.clip_len,
                          num_classes=args.classes, partial_bn=False),
        optim=OptimConfig(lr=args.lr, epochs=args.epochs,
                          lr_steps=(max(args.epochs * 2 // 3, 1),),
                          ema_decay=0.999),
        run=RunConfig(run_dir=args.out, model_name=tag, display=8,
                      ckpt_light=True),
    ).validate()

    def mk(n, seed):
        return LearnableClipSource(
            n_videos=n, clip_len=args.clip_len, size=(args.crop, args.crop),
            num_classes=args.classes, fields=("rgb", "label"), seed=seed,
            noise=args.noise, hard=args.hard, distractors=args.distractors,
            occlude=args.occlude)

    t0 = time.perf_counter()
    res = run_training(cfg, "sd", mk(args.videos, 0),
                       mk(max(args.videos // 4, 16), 1))
    wall = time.perf_counter() - t0

    heads = ("mid1", "mid2", "mid3", "final")
    curves = {k: [] for k in heads}
    mpath = os.path.join(res["run_dir"], "metrics.jsonl")
    if os.path.isfile(mpath):
        for line in open(mpath):
            r = json.loads(line)
            for k in heads:
                curves[k].append(round(float(r.get(f"val_{k}_top1", -1)), 2))

    out = {"tool": "probe_exits", "ts": time.strftime("%F %T"),
           "lr": args.lr, "epochs": args.epochs, "videos": args.videos,
           "batch": args.batch, "classes": args.classes, "hard": args.hard,
           "distractors": args.distractors, "occlude": args.occlude,
           "noise": args.noise, "wall_s": round(wall, 1),
           "s_per_epoch": round(wall / max(args.epochs, 1), 1),
           "last": {k: curves[k][-1] if curves[k] else -1 for k in heads},
           "curves": curves}
    print(json.dumps(out))
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, f"probe_{tag}.json"), "w") as f:
        json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    main()
