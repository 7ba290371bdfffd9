"""Loader-fed END-TO-END inference throughput on the real chip (VERDICT r3
next #6).

The 470 clips/s inference headline times device-resident tensors; round 3
measured the loader-fed TRAIN chain but never the multi-clip TEST protocol.
This measures the real serving-eval chain:

  synthetic EgoGesture JPEG tree (320x240 frames)
    -> InferenceDataset (clip_num=10, uniform_train sampling; the
       test.py:260-284 protocol) + Loader
    -> jitted scorer (on-device normalize + TSN/ACTION ResNet-50 bf16
       + softmax clip vote) @ 224^2 / T=8

and reports e2e videos/s + clips/s next to the device-only rate from the
same process, plus the host decode rate per core (each video = clip_num*T
JPEG decodes), grounding the cores-to-saturate arithmetic for the eval
path the way bench_e2e_train.py grounds it for training.

Results go to a VERSION-CONTROLLED path by default (VERDICT r3 next #7).

  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_e2e_infer.py \
      [--videos_per_batch 16] [--batches 6] [--backend native_fast]
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

jax.config.update("jax_compilation_cache_dir", "/tmp/ehgr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

T, HW, CLS, K = 8, 224, 83, 10
MEAN, STD = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)


def build_tree(root: str):
    from ehgr_tpu.data.synthetic import make_synthetic_ego_tree

    # test-split subjects only need to yield >= a few batches of videos
    return make_synthetic_ego_tree(
        root, subjects=(5, 6, 1, 2), groups=2, gestures_per_group=6,
        frames_per_gesture=48, size=(240, 320), num_classes=CLS)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--videos_per_batch", type=int, default=16)
    p.add_argument("--batches", type=int, default=6)
    p.add_argument("--backend", default="native_fast",
                   choices=["pil", "native", "native_fast"])
    p.add_argument("--workers", type=int, default=2)
    p.add_argument("--tree", default="", help="reuse an existing tree root")
    p.add_argument("--out", default="runs/round4_e2e_infer.json")
    args = p.parse_args(argv)

    from ehgr_tpu.configs import Config, DataConfig, ModelConfig
    from ehgr_tpu.data.annotations import construct_annot_ego
    from ehgr_tpu.data.factory import build_test_dataset
    from ehgr_tpu.data.pipeline import Loader
    from ehgr_tpu.models.tsn import variant
    from ehgr_tpu.ops.preprocess_device import normalize_clip

    root = args.tree or tempfile.mkdtemp(prefix="e2e_itree_")
    t0 = time.perf_counter()
    if not os.path.isdir(os.path.join(root, "frames")):
        paths = build_tree(root)
    else:
        paths = {"frame_path": os.path.join(root, "frames"),
                 "label_path": os.path.join(root, "labels")}
    annot = os.path.join(root, "annot")
    os.makedirs(annot, exist_ok=True)
    for mode in ("train", "test"):
        construct_annot_ego(paths["frame_path"], paths["label_path"],
                            annot, mode)
    tree_s = time.perf_counter() - t0
    print(f"[e2e-infer] tree ready in {tree_s:.0f}s", flush=True)

    cfg = Config(
        data=DataConfig(dataset="EgoGesture", annot_path=annot,
                        backend=args.backend, clip_len=T, clip_num=K,
                        num_classes=CLS, scale_size=HW, crop_size=HW,
                        num_workers=args.workers),
        model=ModelConfig(arch="tsn", num_segments=T, num_classes=CLS,
                          partial_bn=False, dtype="bfloat16"),
    ).validate()

    ds = build_test_dataset(cfg)  # InferenceDataset, uniform_train, K clips

    # --- host-only decode rate (one core, in-process) --------------------
    # warm outside the timed range (native .so load, page cache; ADVICE r3)
    ds[len(ds) - 1]
    n_host = min(8, len(ds) - 1)
    t0 = time.perf_counter()
    for i in range(n_host):
        ds[i]
    host_videos = n_host / (time.perf_counter() - t0)
    print(f"[e2e-infer] host decode: {host_videos:.2f} videos/s/core "
          f"({host_videos * K:.1f} clips/s/core)", flush=True)

    # --- jitted protocol scorer (runner.run_test's program) --------------
    model = variant("tsn", num_class=CLS, num_segments=T,
                    base_model="resnet50", temporal="action",
                    partial_bn=False, dtype=jnp.bfloat16)
    x0 = jnp.zeros((2, T, HW, HW, 3), jnp.float32)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        {"params": jax.random.key(0)}, x0)

    @jax.jit
    def score(frames_u8):                     # [V, K, T, H, W, C]
        v, k = frames_u8.shape[:2]
        x = normalize_clip(frames_u8, MEAN, STD, dtype=jnp.bfloat16)
        x = x.reshape((v * k, T) + x.shape[3:])
        logits = model.apply(variables, x, train=False)
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.mean(probs.reshape(v, k, -1), axis=1)

    # --- device-only reference rate (resident synthetic batch) -----------
    # Only subject 2 of the tree's (5, 6, 1, 2) is in the EgoGesture test
    # split (annotations.py:24), so the test set can be smaller than the
    # requested batch; clamp or drop_last=True yields ZERO batches.
    V = max(1, min(args.videos_per_batch, len(ds)))
    rng = np.random.default_rng(3)
    bdev = jnp.asarray(rng.integers(0, 256, (V, K, T, HW, HW, 3)), jnp.uint8)
    for _ in range(2):
        r = score(bdev)
    float(jnp.sum(r))                         # hard sync (CLAUDE.md)
    t0 = time.perf_counter()
    outs = [score(bdev) for _ in range(4)]
    float(jnp.sum(outs[-1]))
    dev_videos = 4 * V / (time.perf_counter() - t0)
    print(f"[e2e-infer] device-only: {dev_videos:.1f} videos/s "
          f"({dev_videos * K:.0f} clips/s)", flush=True)

    # --- end-to-end: loader -> score ------------------------------------
    loader = Loader(ds, batch_size=V, shuffle=False,
                    num_workers=args.workers, drop_last=True)
    it = iter(loader)
    warm = next(it)                           # compile with loader shapes
    r = score(jnp.asarray(warm["rgb"]))
    float(jnp.sum(r))
    print("[e2e-infer] loader-shape scorer compiled", flush=True)

    done = 0
    correct = 0
    total = 0
    t0 = time.perf_counter()
    while done < args.batches:
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            batch = next(it)
        probs = score(jnp.asarray(batch["rgb"]))
        pred = np.asarray(jnp.argmax(probs, axis=-1))
        correct += int((pred == np.asarray(batch["label"])).sum())
        total += pred.shape[0]
        done += 1
    e2e_videos = total / (time.perf_counter() - t0)

    out = {"tool": "bench_e2e_infer", "ts": time.strftime("%F %T"),
           "device": str(jax.devices()[0]),
           "backend": args.backend, "workers": args.workers,
           "videos_per_batch": V, "clip_num": K, "batches": done,
           "host_videos_per_s_1core": round(host_videos, 3),
           "host_clips_per_s_1core": round(host_videos * K, 2),
           "device_only_videos_per_s": round(dev_videos, 2),
           "device_only_clips_per_s": round(dev_videos * K, 1),
           "e2e_videos_per_s": round(e2e_videos, 2),
           "e2e_clips_per_s": round(e2e_videos * K, 1),
           "cores_to_saturate": round(dev_videos / max(host_videos, 1e-9), 1),
           "host_bound": bool(e2e_videos < 0.8 * dev_videos),
           # sanity only: this tool runs RANDOM-INIT weights, so the value
           # is chance-level; reported to make that explicit (ADVICE r4)
           "e2e_top1_pct": round(100.0 * correct / max(total, 1), 2)}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
