"""int8-static vs bf16 ACCURACY agreement on a trained checkpoint
(VERDICT r2 next #4, second half).

Round 2 pinned int8 numerics only on random-init models (cos > 0.98,
``tests/test_quantize.py``); the accuracy cost on a TRAINED network with
loader-calibrated scales was unmeasured.  This tool runs the whole chain
on the chip:

  1. train the flagship ACTION TSN for ``--steps`` steps on the synthetic
     backend at protocol geometry (224^2 / T=8) — the dress-rehearsal
     recipe (labels are learnable: per-class pixel bias),
  2. evaluate the SAME multi-clip protocol clips through
       (a) the bf16 model, and
       (b) the static-int8 model calibrated on the first eval batches
           (the ADVICE-r2 loader-calibration path in eval/runner),
  3. report top-1 for both, the delta, and per-clip final-logit cosine.

  python tools/bench_int8_agreement.py [--steps 60] [--classes 16]

Round 5 (VERDICT r4 next #3): pass ``--checkpoint <sd best> --task
motion_hard --crop 64`` to skip the throwaway training and measure
agreement on the REAL trained model (the dress-rehearsal checkpoint) over
the held-out hard-task test split.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np
import torch  # noqa: F401  (torch before jax; CLAUDE.md)
import jax
import jax.numpy as jnp

# persistent jit cache: repeat tool invocations skip the ~5 min remote
# compiles (tunnel compile service)
jax.config.update("jax_compilation_cache_dir", "/tmp/ehgr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--classes", type=int, default=16)
    p.add_argument("--clip_len", type=int, default=8)
    p.add_argument("--crop", type=int, default=224)
    p.add_argument("--clip_num", type=int, default=4)
    p.add_argument("--checkpoint", default="",
                   help="trained ckpt dir; skips the throwaway training")
    p.add_argument("--task", default="random",
                   choices=["random", "motion", "motion_hard"])
    p.add_argument("--videos", type=int, default=64,
                   help="synthetic_videos (test split = videos // 2)")
    args = p.parse_args(argv)

    import os
    import tempfile

    from ehgr_tpu.configs import (Config, DataConfig, ModelConfig,
                                  OptimConfig, RunConfig)
    from ehgr_tpu.data.factory import build_test_dataset, build_train_datasets
    from ehgr_tpu.data.pipeline import Loader
    from ehgr_tpu.eval.runner import _build_model
    from ehgr_tpu.ops.preprocess_device import normalize_clip
    from ehgr_tpu.train.loop import run_training

    out_dir = tempfile.mkdtemp(prefix="int8_agree_")
    cfg = Config(
        data=DataConfig(dataset="synthetic", backend="synthetic",
                        clip_len=args.clip_len, batch_size=args.batch,
                        num_classes=args.classes, crop_size=args.crop,
                        scale_size=args.crop + 32, clip_num=args.clip_num,
                        synthetic_task=args.task,
                        synthetic_videos=args.videos, num_workers=0),
        model=ModelConfig(arch="tsn", num_segments=args.clip_len,
                          num_classes=args.classes, partial_bn=False),
        optim=OptimConfig(lr=0.01, epochs=1, lr_steps=(1000,),
                          ema_decay=0.999),
        run=RunConfig(run_dir=out_dir, model_name="agree", display=20),
    ).validate()

    if args.checkpoint:
        best, train_s = args.checkpoint, 0.0
    else:
        t0 = time.perf_counter()
        res = run_training(cfg, "baseline",
                           *build_train_datasets(cfg, "baseline"),
                           max_steps_per_epoch=args.steps)
        train_s = time.perf_counter() - t0
        best = os.path.join(res["run_dir"], "agree_best_ckpt")
    assert os.path.isdir(best), "no checkpoint written"

    cfg = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, checkpoint_path=best))
    dataset = build_test_dataset(cfg)
    loader = Loader(dataset, batch_size=2, shuffle=False, num_workers=0,
                    drop_last=False)

    # calibration clips exactly as run_test feeds them: first 2 loader
    # batches, clip-flattened to [N, T, H, W, C] uint8
    t = args.clip_len
    calib = []
    for i, b in enumerate(loader):
        rgb = np.asarray(b["rgb"])
        calib.append(rgb.reshape((-1, t) + rgb.shape[3:]))
        if i >= 1:
            break

    model_f, vars_f = _build_model(cfg, "tsn")
    cfg_q = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, quantize="static"))
    model_q, vars_q = _build_model(cfg_q, "tsn", calib_batches=calib)
    # guard: the int8 path must actually be engaged — a silently-float
    # model would report a perfect (meaningless) agreement
    scales = jax.tree_util.tree_leaves(vars_q.get("quant", {}))
    assert scales and max(float(jnp.max(s)) for s in scales) > 0, \
        "static-int8 calibration produced no activation scales"

    mean, std = cfg.data.mean, cfg.data.std

    def make_score(model, variables):
        @jax.jit
        def score(frames_u8):
            v, k, ct = frames_u8.shape[:3]
            crops = ct // t
            x = normalize_clip(frames_u8, mean, std,
                               dtype=jnp.dtype(cfg.model.dtype))
            x = x.reshape((v * k * crops, t) + x.shape[3:])
            logits = model.apply(variables, x, train=False)
            logits = logits.reshape(v, k * crops, -1).astype(jnp.float32)
            probs = jnp.mean(jax.nn.softmax(logits, axis=-1), axis=1)
            return probs, logits
        return score

    score_f = make_score(model_f, vars_f)
    score_q = make_score(model_q, vars_q)

    n = c1f = c1q = agree = 0
    coses = []
    for b in loader:
        frames = jnp.asarray(b["rgb"])
        labels = np.asarray(b["label"])
        pf, lf = map(np.asarray, score_f(frames))
        pq, lq = map(np.asarray, score_q(frames))
        n += len(labels)
        c1f += int((pf.argmax(-1) == labels).sum())
        c1q += int((pq.argmax(-1) == labels).sum())
        agree += int((pf.argmax(-1) == pq.argmax(-1)).sum())
        num = (lf * lq).sum(-1)
        den = np.linalg.norm(lf, axis=-1) * np.linalg.norm(lq, axis=-1)
        coses.append(num / np.maximum(den, 1e-12))
    coses = np.concatenate([c.ravel() for c in coses])

    out = {"steps": args.steps, "classes": args.classes,
           "clip_num": args.clip_num, "n_videos": n,
           "crop": args.crop, "task": args.task,
           "checkpoint": args.checkpoint,
           "train_wall_s": round(train_s, 1),
           "top1_bf16": round(100.0 * c1f / n, 2),
           "top1_int8": round(100.0 * c1q / n, 2),
           "top1_delta": round(100.0 * (c1q - c1f) / n, 2),
           "pred_agreement_pct": round(100.0 * agree / n, 2),
           "logit_cos_mean": round(float(coses.mean()), 6),
           "logit_cos_min": round(float(coses.min()), 6)}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
