"""Synthetic-frames backend (SURVEY.md §7 step 2): everything downstream of
the data layer runs without the real EgoGesture/NvGesture trees.

Two tiers:
* ``make_synthetic_ego_tree`` — writes a real miniature Subject/Scene/Color
  JPEG tree + label CSVs so the ANNOTATION BUILDER itself is exercised.
* ``SyntheticClipSource`` — in-memory random clips for trainers/benches
  (no disk, no decode), with labels derived from a per-class pixel bias so
  a model can actually fit it in tests.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np
from PIL import Image


def make_synthetic_ego_tree(root: str, subjects=(3, 1, 2), scenes: int = 1,
                            groups: int = 1, gestures_per_group: int = 3,
                            frames_per_gesture: int = 24,
                            size: Tuple[int, int] = (48, 64),
                            num_classes: int = 5, seed: int = 0) -> Dict[str, str]:
    """Build a miniature EgoGesture-layout tree (one train/val/test subject
    by default — IDs 3/1/2 fall in the reference's respective splits).
    Returns {'frame_path', 'label_path'}."""
    rng = np.random.default_rng(seed)
    frame_path = os.path.join(root, "frames")
    label_path = os.path.join(root, "labels")
    h, w = size
    for sub in subjects:
        for scene in range(1, scenes + 1):
            lab_dir = os.path.join(label_path, f"subject{sub:02}",
                                   f"Scene{scene}")
            os.makedirs(lab_dir, exist_ok=True)
            for g in range(1, groups + 1):
                rgb_dir = os.path.join(frame_path, f"Subject{sub:02}",
                                       f"Scene{scene}", "Color", f"rgb{g}")
                dep_dir = os.path.join(frame_path, f"Subject{sub:02}",
                                       f"Scene{scene}", "Depth", f"depth{g}")
                dest_dir = os.path.join(frame_path, f"Subject{sub:02}",
                                        f"Scene{scene}", "Depth_Est",
                                        f"depth_est{g}")
                for d in (rgb_dir, dep_dir, dest_dir):
                    os.makedirs(d, exist_ok=True)
                rows = []
                frame_i = 1
                for _ in range(gestures_per_group):
                    cls = int(rng.integers(1, num_classes + 1))  # 1-based
                    start = frame_i
                    end = frame_i + frames_per_gesture
                    for i in range(start, end):
                        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                        # class-dependent bias so models can fit
                        arr[..., 0] = np.clip(
                            arr[..., 0] * 0.5 + cls * 40, 0, 255)
                        Image.fromarray(arr).save(
                            os.path.join(rgb_dir, f"{i:06}.jpg"))
                        dep = rng.integers(0, 256, (h, w), dtype=np.uint8)
                        Image.fromarray(dep, "L").save(
                            os.path.join(dep_dir, f"{i:06}.jpg"))
                        Image.fromarray(dep, "L").save(
                            os.path.join(dest_dir, f"{i:06}.jpg"))
                    rows.append((cls, start, end + 1))  # builder uses end-1
                    frame_i = end
                with open(os.path.join(lab_dir, f"Group{g}.csv"), "w") as f:
                    for cls, s, e in rows:
                        f.write(f"{cls},{s},{e}\n")
    return {"frame_path": frame_path, "label_path": label_path}


def make_synthetic_nv_tree(root: str, n_videos: int = 6,
                           frames_per_video: int = 24,
                           size: Tuple[int, int] = (60, 80),
                           num_classes: int = 5, seed: int = 0) -> str:
    """Build a miniature NvGesture-layout tree: per-video
    ``Video_data/class_XX/subjectN_r0/{sk_color_all,sk_depth_all,
    sk_depth_est_all}/*.jpg`` plus the two ``.lst`` files the annotation
    builder parses (``/root/reference/data/dataset_NvGesture.py:13-69``
    field layout: ``path:.`` 0, start/end in field 2, ``label:`` field 4).
    Returns the dataset root (== the ``.lst`` directory)."""
    rng = np.random.default_rng(seed)
    h, w = size
    lines = []
    for v in range(n_videos):
        cls = v % num_classes + 1  # 1-based in the .lst
        rel = f"Video_data/class_{cls:02}/subject{v + 1}_r0"
        base = os.path.join(root, rel)
        for sub in ("sk_color_all", "sk_depth_all", "sk_depth_est_all"):
            os.makedirs(os.path.join(base, sub), exist_ok=True)
        for i in range(1, frames_per_video + 1):
            arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            arr[..., 0] = np.clip(arr[..., 0] * 0.5 + cls * 40, 0, 255)
            Image.fromarray(arr).save(
                os.path.join(base, "sk_color_all", f"{i:05}.jpg"))
            dep = rng.integers(0, 256, (h, w), dtype=np.uint8)
            Image.fromarray(dep, "L").save(
                os.path.join(base, "sk_depth_all", f"{i:05}.jpg"))
            Image.fromarray(dep, "L").save(
                os.path.join(base, "sk_depth_est_all", f"{i:05}.jpg"))
        lines.append(f"path:./{rel} depth:x color:x:1:{frames_per_video - 1} "
                     f"duration:x label:{cls}\n")
    for mode in ("train", "test"):
        with open(os.path.join(
                root, f"nvgesture_{mode}_correct_cvpr2016_v2.lst"), "w") as f:
            f.writelines(lines)
    return root


class SyntheticClipSource:
    """In-memory dataset with the same mapping interface as
    ``ehgr_tpu.data.datasets`` classes; fields selectable per stage."""

    def __init__(self, n_videos: int = 64, clip_len: int = 8,
                 size: Tuple[int, int] = (224, 224), num_classes: int = 83,
                 fields: Tuple[str, ...] = ("rgb", "label"), seed: int = 0,
                 clip_num: int = 0):
        self.n = n_videos
        self.t = clip_len
        self.h, self.w = size
        self.num_classes = num_classes
        self.fields = fields
        self.clip_num = clip_num
        rng = np.random.default_rng(seed)
        self.labels = rng.integers(0, num_classes, n_videos).astype(np.int32)
        self._seed = seed

    def __len__(self):
        return self.n

    def _frames(self, rng, label, shape):
        x = rng.integers(0, 256, shape, dtype=np.uint8)
        x[..., 0] = np.clip(
            x[..., 0] * 0.5 + (label % 6) * 40, 0, 255).astype(np.uint8)
        return x

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(self._seed * 100003 + idx)
        label = int(self.labels[idx])
        out: Dict[str, np.ndarray] = {"label": np.int32(label)}
        if self.clip_num:
            shape = (self.clip_num, self.t, self.h, self.w, 3)
        else:
            shape = (self.t, self.h, self.w, 3)
        if "rgb" in self.fields:
            out["rgb"] = self._frames(rng, label, shape)
        for name in ("depth", "n_depth", "depth_est", "n_depth_est"):
            if name in self.fields:
                out[name] = rng.integers(
                    0, 256, (self.t, self.h, self.w, 1), dtype=np.uint8)
        return out
