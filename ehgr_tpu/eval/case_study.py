"""Qualitative prediction-video exporter (ref ``case_study.py`` — broken as
committed: imports missing ``models.models_mtask``; rebuilt here on the
working TSN).

For each video: run the multi-clip protocol, annotate frames with
"Pred: <class> / Label: <class>" banners, export per-frame JPEGs and an
animated GIF (the reference writes mp4 via cv2, ``case_study.py:108-120``;
this image has no cv2/ffmpeg, and GIFs serve the same qualitative role)."""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional, Sequence

import numpy as np
from PIL import Image, ImageDraw

import jax
import jax.numpy as jnp

from ehgr_tpu.ops.preprocess_device import normalize_clip


def annotate_frame(frame_u8: np.ndarray, pred_name: str, label_name: str,
                   correct: bool) -> Image.Image:
    img = Image.fromarray(frame_u8).convert("RGB")
    draw = ImageDraw.Draw(img)
    color = (0, 200, 0) if correct else (220, 0, 0)
    draw.rectangle([0, 0, img.width, 26], fill=(0, 0, 0))
    draw.text((4, 2), f"P:{pred_name}", fill=color)
    draw.text((4, 14), f"L:{label_name}", fill=(255, 255, 255))
    return img


def export_case_study(model, variables, dataset, save_dir: str,
                      class_names: Optional[Sequence[str]] = None,
                      max_videos: int = 10,
                      mean=(0.485, 0.456, 0.406),
                      std=(0.229, 0.224, 0.225)) -> List[Dict]:
    """Score videos from a CaseStudyDataset and export annotated GIFs.
    Returns a manifest of {video, pred, label, correct, gif} records."""
    os.makedirs(save_dir, exist_ok=True)
    log = logging.getLogger(__name__)

    @jax.jit
    def score(frames_u8):
        k, t = frames_u8.shape[:2]
        x = normalize_clip(frames_u8, mean, std)
        logits = model.apply(variables, x, train=False)
        if isinstance(logits, tuple):
            logits = logits[0]
        return jnp.mean(jax.nn.softmax(logits, axis=-1), axis=0)

    manifest = []
    for idx in range(min(max_videos, len(dataset))):
        sample = dataset[idx]
        probs = score(jnp.asarray(sample["rgb"]))
        pred = int(jnp.argmax(probs))
        label = int(sample["label"])
        name = lambda c: (class_names[c] if class_names else str(c))

        frames = sample["rgb"][0]  # first clip [T, H, W, 3]
        imgs = [annotate_frame(f, name(pred), name(label), pred == label)
                for f in frames]
        gif = os.path.join(save_dir, f"video{idx:04d}.gif")
        imgs[0].save(gif, save_all=True, append_images=imgs[1:],
                     duration=120, loop=0)
        rec = {"video": idx, "pred": pred, "label": label,
               "correct": pred == label, "gif": gif}
        log.info("case_study %s", rec)
        manifest.append(rec)
    return manifest
