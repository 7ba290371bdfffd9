"""Clip datasets — the L1 surface of the reference, as numpy-producing maps.

References: ``dataset_video_{original,MTMM,SD,inference,case_study}``
(``/root/reference/data/dataset_EgoGesture.py:141-352``,
``data/dataset_NvGesture.py:113-...``).  Differences by design:

* Output convention is ``[T, H, W, C]`` float32/uint8 dicts (the device
  convention), not torch ``[T*C, H, W]`` stacks.
* ``DistillDataset`` exists — the reference's ``dataset_video_distill`` is
  referenced by ``train_sd.py:572,588`` but never defined (latent
  AttributeError, SURVEY.md §2.1); its contract is (rgb, label), same as
  ``dataset_video_SD``.
* The MTMM dataset returns the fixed 6-field contract (rgb, depth, label,
  depth_est, n_depth, n_depth_est) — the reference trainer unpacks 7
  (``train_mtmm.py:209-210``), a documented drift we do not copy.
* Datasets emit uint8 frames; normalization happens on device
  (``ehgr_tpu.ops.preprocess_device``) — the pipeline ships bytes, not
  floats (4x less host->device traffic).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional, Sequence

import numpy as np
from PIL import Image

from ehgr_tpu.data.annotations import load_annotations
from ehgr_tpu.ops import temporal_transforms as tt


def _decode(paths: Sequence[str], indices: np.ndarray, mode: str,
            spatial: Optional[Callable]) -> np.ndarray:
    """Decode selected frames, apply a group spatial transform, return
    ``[T', H, W, C]`` uint8 (T' may be crops*T for multi-crop evals)."""
    imgs = [Image.open(paths[i]).convert(mode) for i in indices]
    if spatial is not None:
        imgs = spatial(imgs)
    arrs = []
    for im in imgs:
        a = np.asarray(im)
        if a.ndim == 2:
            a = a[:, :, None]
        arrs.append(a)
    return np.stack(arrs, axis=0)


class ClipDataset:
    """Base: one row of the annotation pickle -> one training example."""

    #: columns this variant decodes
    modalities = ("rgb",)

    def __init__(self, annot_path: str, mode: str,
                 spatial_transform: Optional[Callable] = None,
                 temporal_transform: str = "uniform_train",
                 clip_len: int = 8, seed: int = 0):
        df = load_annotations(annot_path, mode)
        self.samples = {c: list(df[c]) for c in df.columns if c != "label"}
        self.labels = [int(l) for l in df["label"]]
        self.spatial = spatial_transform
        self.temporal = temporal_transform
        self.clip_len = clip_len
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.labels)

    def _sample_indices(self, num_frames: int) -> np.ndarray:
        if self.temporal == "uniform_train":
            return tt.uniform_train(num_frames, self.clip_len, self.rng)
        if self.temporal == "uniform_val":
            return tt.uniform_val(num_frames, self.clip_len)
        if self.temporal == "uniform_test":
            return tt.uniform_test(num_frames, self.clip_len)
        if self.temporal == "dense_train":
            return tt.dense_train(num_frames, self.clip_len, self.rng)
        raise ValueError(self.temporal)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        raise NotImplementedError


class OriginalDataset(ClipDataset):
    """(rgb, depth, label) — baseline/slowonly trainers
    (``dataset_video_original``, ref :141-169)."""

    def __getitem__(self, idx):
        rgb_p = self.samples["rgb"][idx]
        sel = self._sample_indices(len(rgb_p))
        return {
            "rgb": _decode(rgb_p, sel, "RGB", self.spatial),
            "depth": _decode(self.samples["depth"][idx], sel, "L",
                             self.spatial),
            "label": np.int32(self.labels[idx]),
        }


class SDDataset(ClipDataset):
    """(rgb, label) — SD stage (``dataset_video_SD``, ref :237-260)."""

    def __getitem__(self, idx):
        rgb_p = self.samples["rgb"][idx]
        sel = self._sample_indices(len(rgb_p))
        return {"rgb": _decode(rgb_p, sel, "RGB", self.spatial),
                "label": np.int32(self.labels[idx])}


class DistillDataset(SDDataset):
    """The dataset the reference forgot to define (train_sd.py:572):
    same (rgb, label) contract as SDDataset."""


class MTMMDataset(ClipDataset):
    """6-field MTMM contract with NEXT-segment depth targets
    (``dataset_video_MTMM``, ref :172-234; next indices at :190-192)."""

    def __getitem__(self, idx):
        rgb_p = self.samples["rgb"][idx]
        depth_p = self.samples["depth"][idx]
        dest_p = self.samples["depth_est"][idx]
        n = len(rgb_p)
        sel = self._sample_indices(n)
        nxt = tt.next_segment_indices(sel, n)
        return {
            "rgb": _decode(rgb_p, sel, "RGB", self.spatial),
            "depth": _decode(depth_p, sel, "L", self.spatial),
            "depth_est": _decode(dest_p, sel, "L", self.spatial),
            "n_depth": _decode(depth_p, nxt, "L", self.spatial),
            "n_depth_est": _decode(dest_p, nxt, "L", self.spatial),
            "label": np.int32(self.labels[idx]),
        }


class InferenceDataset(ClipDataset):
    """``clip_num`` random clips per video -> ``[K, T', H, W, 3]``
    (``dataset_video_inference``, ref :263-296; the test.py protocol)."""

    def __init__(self, *args, clip_num: int = 10, **kw):
        super().__init__(*args, **kw)
        self.clip_num = clip_num

    def __getitem__(self, idx):
        rgb_p = self.samples["rgb"][idx]
        n = len(rgb_p)
        clips = []
        for _ in range(self.clip_num):
            sel = self._sample_indices(n)
            clips.append(_decode(rgb_p, sel, "RGB", self.spatial))
        return {"rgb": np.stack(clips, axis=0),
                "label": np.int32(self.labels[idx])}


class CaseStudyDataset(InferenceDataset):
    """Inference clips + depth + frame paths for qualitative export
    (``dataset_video_case_study``, ref :299-352)."""

    def __getitem__(self, idx):
        out = super().__getitem__(idx)
        rgb_p = self.samples["rgb"][idx]
        n = len(rgb_p)
        sel = self._sample_indices(n)
        out["depth"] = _decode(self.samples["depth"][idx], sel, "L",
                               self.spatial)
        if "depth_est" in self.samples:
            out["depth_est"] = _decode(self.samples["depth_est"][idx], sel,
                                       "L", self.spatial)
        out["paths"] = [rgb_p[i] for i in sel]
        return out


DATASETS = {
    "original": OriginalDataset,
    "mtmm": MTMMDataset,
    "sd": SDDataset,
    "distill": DistillDataset,
    "inference": InferenceDataset,
    "case_study": CaseStudyDataset,
}
