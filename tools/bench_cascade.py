"""Early-exit cascade on the real chip: per-stage rates + operating curve.

Trains a ``tsn_sd`` briefly on the synthetic backend (protocol geometry,
learnable labels), measures each deploy stage's inference throughput
(tsn_middle1/2/3 and the full final-head model), then evaluates the
confidence-gated cascade curve with those measured rates
(``ehgr_tpu/eval/cascade.py``), exercising the real bucketed two-pass path.

  python tools/bench_cascade.py [--steps 60] [--batch 256] [--classes 16]

Round 5 (VERDICT r4 next #3): pass ``--checkpoint <sd best> --task
motion_hard --crop 64`` to sweep the operating curve on the REAL trained
dress-rehearsal model — accuracy and rate measured at the same geometry.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import tempfile
import time

import numpy as np
import torch  # noqa: F401  (torch before jax; CLAUDE.md)
import jax
import jax.numpy as jnp

# persistent jit cache: repeat tool invocations skip the ~5 min remote
# compiles (tunnel compile service)
jax.config.update("jax_compilation_cache_dir", "/tmp/ehgr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

T = 8


def rate_of(model, variables, batch, hw, iters=8):
    from ehgr_tpu.ops.preprocess_device import normalize_clip

    @jax.jit
    def score(frames_u8):
        x = normalize_clip(frames_u8, dtype=jnp.bfloat16)
        return model.apply(variables, x, train=False)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (batch, T, hw, hw, 3)),
                         jnp.uint8)
    for _ in range(3):
        float(jnp.sum(score(frames)))    # scalar fetch = real barrier
    t0 = time.perf_counter()
    outs = [score(frames) for _ in range(iters)]
    float(jnp.sum(outs[-1]))
    return batch * iters / (time.perf_counter() - t0)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--train_batch", type=int, default=16)
    p.add_argument("--classes", type=int, default=16)
    p.add_argument("--clip_num", type=int, default=4)
    p.add_argument("--exit", type=int, default=1, dest="exit_k")
    p.add_argument("--crop", type=int, default=224)
    p.add_argument("--checkpoint", default="",
                   help="trained ckpt dir; skips the throwaway training")
    p.add_argument("--task", default="random",
                   choices=["random", "motion", "motion_hard"])
    p.add_argument("--videos", type=int, default=64)
    args = p.parse_args(argv)
    HW = args.crop

    from ehgr_tpu.configs import (Config, DataConfig, ModelConfig,
                                  OptimConfig, RunConfig)
    from ehgr_tpu.data.factory import build_train_datasets
    from ehgr_tpu.eval.cascade import run_cascade_test
    from ehgr_tpu.eval.runner import _build_model
    from ehgr_tpu.train.loop import run_training

    out_dir = tempfile.mkdtemp(prefix="cascade_")
    cfg = Config(
        data=DataConfig(dataset="synthetic", backend="synthetic",
                        clip_len=T, batch_size=args.train_batch,
                        num_classes=args.classes, crop_size=HW,
                        scale_size=HW + 32, clip_num=args.clip_num,
                        synthetic_task=args.task,
                        synthetic_videos=args.videos, num_workers=0),
        model=ModelConfig(arch="tsn_sd", num_segments=T,
                          num_classes=args.classes, partial_bn=False),
        optim=OptimConfig(lr=0.01, epochs=1, lr_steps=(1000,),
                          ema_decay=0.999),
        run=RunConfig(run_dir=out_dir, model_name="cascade", display=20),
    ).validate()

    if args.checkpoint:
        best, train_s = args.checkpoint, 0.0
    else:
        t0 = time.perf_counter()
        res = run_training(cfg, "sd", *build_train_datasets(cfg, "sd"),
                           max_steps_per_epoch=args.steps)
        train_s = time.perf_counter() - t0
        best = os.path.join(res["run_dir"], "cascade_best_ckpt")
    assert os.path.isdir(best), "no checkpoint written"
    cfg = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, checkpoint_path=best))

    rates = {}
    for arch in ("tsn_middle1", "tsn_middle2", "tsn_middle3", "tsn"):
        m, v = _build_model(cfg, arch)
        rates[arch] = round(rate_of(m, v, args.batch, HW), 1)
        print(f"[cascade] {arch}: {rates[arch]} clips/s @ b{args.batch}",
              flush=True)

    res = run_cascade_test(cfg, exit_k=args.exit_k,
                           rate_exit=rates[f"tsn_middle{args.exit_k}"],
                           rate_full=rates["tsn"])
    out = {"train_steps": args.steps, "train_wall_s": round(train_s, 1),
           "classes": args.classes, "crop": HW, "task": args.task,
           "checkpoint": args.checkpoint, "stage_clips_per_sec": rates,
           "batch": args.batch, **res}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
