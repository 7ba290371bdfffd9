"""Loader-fed END-TO-END training throughput on the real chip (VERDICT r2
next #5).

Round 2's bench timed the jitted MTMM step on device-resident tensors
(91.6 clips/s); the claim that the host pipeline can feed it was an
extrapolation from isolated decode benches.  This measures the real chain:

  synthetic EgoGesture JPEG tree (320x240 frames, RGB + depth)
    -> MTMMDataset + Loader (decode backend selectable, train transforms)
    -> select_batch -> jitted MTMM train step @ 224^2 / T=8 / batch 32

and reports end-to-end clips/s next to the device-only rate from the same
process, plus the host decode rate per core, so the "clips/s/core needed"
arithmetic in docs/PERF.md is grounded in one measurement.

  python tools/bench_e2e_train.py [--steps 20] [--batch 32] \
      [--backend native_fast] [--workers 2]
"""

from __future__ import annotations

import argparse
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


T, HW, CLS = 8, 224, 83
MEAN, STD = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)


def build_tree(root: str):
    from ehgr_tpu.data.synthetic import make_synthetic_ego_tree

    # 2 train subjects x 2 groups x 6 gestures x 48 frames: big enough that
    # T=8 uniform sampling sees distinct frames, small enough to build fast
    return make_synthetic_ego_tree(
        root, subjects=(3, 4, 1, 2), groups=2, gestures_per_group=6,
        frames_per_gesture=48, size=(240, 320), num_classes=CLS)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--backend", default="native_fast",
                   choices=["pil", "native", "native_fast"])
    p.add_argument("--workers", type=int, default=2)
    p.add_argument("--tree", default="", help="reuse an existing tree root")
    args = p.parse_args(argv)

    from ehgr_tpu.configs import (Config, DataConfig, LossConfig, ModelConfig,
                                  OptimConfig)
    from ehgr_tpu.data.annotations import construct_annot_ego
    from ehgr_tpu.data.factory import build_train_datasets
    from ehgr_tpu.data.pipeline import Loader
    from ehgr_tpu.models.tsn import variant
    from ehgr_tpu.train.loop import select_batch
    from ehgr_tpu.train.optim import build_optimizer
    from ehgr_tpu.train.steps import create_train_state, make_train_step

    root = args.tree or tempfile.mkdtemp(prefix="e2e_tree_")
    t0 = time.perf_counter()
    if not os.path.isdir(os.path.join(root, "frames")):
        paths = build_tree(root)
    else:
        paths = {"frame_path": os.path.join(root, "frames"),
                 "label_path": os.path.join(root, "labels")}
    annot = os.path.join(root, "annot")
    os.makedirs(annot, exist_ok=True)
    for mode in ("train", "val", "test", "train_plus_val"):
        construct_annot_ego(paths["frame_path"], paths["label_path"],
                            annot, mode)
    tree_s = time.perf_counter() - t0
    print(f"[e2e] tree ready in {tree_s:.0f}s", flush=True)

    cfg = Config(
        data=DataConfig(dataset="EgoGesture", annot_path=annot,
                        backend=args.backend, clip_len=T,
                        batch_size=args.batch, num_classes=CLS,
                        scale_size=HW, crop_size=HW,
                        num_workers=args.workers),
        model=ModelConfig(arch="tsn_mtmm", num_segments=T, num_classes=CLS,
                          partial_bn=False, dtype="bfloat16"),
        optim=OptimConfig(),
    ).validate()

    train_ds, _ = build_train_datasets(cfg, "mtmm")
    loader = Loader(train_ds, batch_size=args.batch, shuffle=True,
                    num_workers=args.workers, drop_last=True)

    # --- host-only decode rate (one core does the work in-process) ------
    # warm on an index OUTSIDE the timed range: native .so load +
    # per-process setup must not be billed, and re-reading the warm clip
    # with a hot page cache must not discount it (ADVICE r3 #2)
    n_host = min(2 * args.batch, len(train_ds) - 1)
    train_ds[len(train_ds) - 1]
    t0 = time.perf_counter()
    for i in range(n_host):
        train_ds[i]
    host_rate = n_host / (time.perf_counter() - t0)
    print(f"[e2e] host decode: {host_rate:.1f} clips/s/core", flush=True)

    # --- device step ----------------------------------------------------
    model = variant("tsn_mtmm", num_class=CLS, num_segments=T,
                    temporal="action", partial_bn=False, dtype=jnp.bfloat16)
    x0 = jnp.zeros((2, T, HW, HW, 3), jnp.float32)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        {"params": jax.random.key(0)}, x0)
    tx, _ = build_optimizer(variables["params"], OptimConfig(),
                            steps_per_epoch=1000)
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, stage="mtmm",
                           loss_cfg=LossConfig(depth_size=HW // 4),
                           ema_decay=0.9999, mean=MEAN, std=STD)
    key = jax.random.key(0)

    # device-only reference rate (same process, synthetic resident batch)
    rng = np.random.default_rng(2)
    bdev = {"rgb": jnp.asarray(rng.integers(
                0, 256, (args.batch, T, HW, HW, 3)), jnp.uint8),
            "depth": jnp.asarray(rng.integers(
                0, 256, (args.batch, T, HW, HW, 1)), jnp.uint8),
            "label": jnp.asarray(rng.integers(0, CLS, (args.batch,)))}
    for i in range(2):
        state, m = step(state, bdev, jax.random.fold_in(key, i))
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(4):
        state, m = step(state, bdev, jax.random.fold_in(key, i))
    float(m["loss"])
    dev_rate = 4 * args.batch / (time.perf_counter() - t0)
    print(f"[e2e] device-only: {dev_rate:.1f} clips/s", flush=True)

    # --- end-to-end: loader -> select_batch -> step ---------------------
    done = 0
    t0 = time.perf_counter()
    it = iter(loader)
    warm = select_batch(next(it), "mtmm", "rgb_depth")
    state, m = step(state, warm, key)     # compile with loader shapes
    float(m["loss"])
    print("[e2e] loader-shape step compiled", flush=True)
    t0 = time.perf_counter()
    while done < args.steps:
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            batch = next(it)
        b = select_batch(batch, "mtmm", "rgb_depth")
        state, m = step(state, b, jax.random.fold_in(key, done))
        done += 1
    loss = float(m["loss"])               # barrier
    e2e_rate = done * args.batch / (time.perf_counter() - t0)

    out = {"backend": args.backend, "workers": args.workers,
           "batch": args.batch, "steps": done,
           "tree_build_s": round(tree_s, 1),
           "host_decode_clips_per_s_1core": round(host_rate, 2),
           "device_only_clips_per_s": round(dev_rate, 1),
           "e2e_clips_per_s": round(e2e_rate, 1),
           "host_bound": bool(e2e_rate < 0.8 * dev_rate),
           "final_loss": round(loss, 3)}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
