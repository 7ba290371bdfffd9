"""Host train-feed rate for the MTMM contract, measured two ways on ONE
tree — the committed tool behind docs/PERF.md's host-loader table.

Methods:
  * ``direct``  — ``train_ds[i]`` in-process, single thread (what a worker
    core actually does per clip: 5 decoded streams x T frames + train
    transforms).
  * ``loader``  — the real ``Loader`` with N worker threads + prefetch,
    wall-clock batches/s (what training sees on this box).

Reconciles the e2e harness's in-process probe against the standalone
table: same tree, same dataset object, same transforms.

  PYTHONPATH=/root/repo python tools/bench_host_loader.py \
      [--tree /tmp/e2e_tree_*] [--backends pil,native,native_fast] \
      [--clips 48] [--workers 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T, HW, CLS = 8, 224, 83


def build_dataset(tree: str, backend: str, batch: int, workers: int):
    from ehgr_tpu.configs import Config, DataConfig, ModelConfig, OptimConfig
    from ehgr_tpu.data.factory import build_train_datasets

    cfg = Config(
        data=DataConfig(dataset="EgoGesture",
                        annot_path=os.path.join(tree, "annot"),
                        backend=backend, clip_len=T, batch_size=batch,
                        num_classes=CLS, scale_size=HW, crop_size=HW,
                        num_workers=workers),
        model=ModelConfig(arch="tsn_mtmm", num_segments=T, num_classes=CLS,
                          partial_bn=False, dtype="bfloat16"),
        optim=OptimConfig(),
    ).validate()
    train_ds, _ = build_train_datasets(cfg, "mtmm")
    return train_ds


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--tree", default="")
    p.add_argument("--backends", default="pil,native,native_fast")
    p.add_argument("--clips", type=int, default=48)
    p.add_argument("--workers", type=int, default=2)
    p.add_argument("--batch", type=int, default=16)
    args = p.parse_args(argv)

    tree = args.tree
    if not tree:
        from ehgr_tpu.data.annotations import construct_annot_ego
        from ehgr_tpu.data.synthetic import make_synthetic_ego_tree

        tree = tempfile.mkdtemp(prefix="hostloader_tree_")
        paths = make_synthetic_ego_tree(
            tree, subjects=(3, 4, 1, 2), groups=2, gestures_per_group=6,
            frames_per_gesture=48, size=(240, 320), num_classes=CLS)
        annot = os.path.join(tree, "annot")
        os.makedirs(annot, exist_ok=True)
        for mode in ("train", "val", "test", "train_plus_val"):
            construct_annot_ego(paths["frame_path"], paths["label_path"],
                                annot, mode)
        print(f"[host] built tree {tree}", flush=True)

    from ehgr_tpu.data.pipeline import Loader

    rows = []
    for backend in args.backends.split(","):
        ds = build_dataset(tree, backend, args.batch, args.workers)
        n = min(args.clips, len(ds))
        ds[0]  # warm (builds the .so, touches files)
        t0 = time.perf_counter()
        for i in range(n):
            ds[i % len(ds)]
        direct = n / (time.perf_counter() - t0)

        loader = Loader(ds, batch_size=args.batch, shuffle=True,
                        num_workers=args.workers, drop_last=True)
        it = iter(loader)
        next(it)  # warm prefetch
        nb = max(2, args.clips // args.batch)
        t0 = time.perf_counter()
        for _ in range(nb):
            try:
                next(it)
            except StopIteration:
                it = iter(loader)
                next(it)
        wall = nb * args.batch / (time.perf_counter() - t0)
        rows.append({"backend": backend,
                     "direct_clips_per_s_1thread": round(direct, 2),
                     "loader_clips_per_s_wall": round(wall, 2)})
        print(f"[host] {backend:12s} direct {direct:6.2f}  "
              f"loader({args.workers}w) {wall:6.2f} clips/s", flush=True)

    print(json.dumps({"tree": tree, "workers": args.workers, "rows": rows}))


if __name__ == "__main__":
    main()
