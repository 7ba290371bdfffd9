"""Pseudo-depth generation (L0 offline prep).

Reference: ``/root/reference/preprocess/generate_pseudo_depth_{ego,nv}.py``
— runs MiDaS DPT_Large over every RGB frame and writes a parallel
``Depth_Est`` JPEG tree.

This environment has no torchvision/network access, so the MiDaS path is
gated: pass ``predictor=`` any callable ``uint8 [H,W,3] -> float [H,W]``
(e.g. a JAX DPT you load yourself) to use a real model.  The built-in
``'gray'`` backend writes luminance-based placeholders so the full
``depth_est`` pipeline (annotations -> MTMM ``rgb_depthest`` training) is
runnable end-to-end without external weights.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np
from PIL import Image


def _gray_predictor(frame: np.ndarray) -> np.ndarray:
    """Luminance placeholder (NOT a depth estimate — pipeline plumbing only)."""
    f = frame.astype(np.float32)
    return (0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]) / 255.0


def generate_pseudo_depth_tree(
        rgb_root: str, out_root: str,
        predictor: Optional[Callable[[np.ndarray], np.ndarray]] = None,
        rgb_dirname: str = "Color", out_dirname: str = "Depth_Est",
        rgb_prefix: str = "rgb", out_prefix: str = "depth_est") -> int:
    """Mirror an EgoGesture-style ``.../Color/rgb{g}/*.jpg`` tree into
    ``.../Depth_Est/depth_est{g}/*.jpg`` (ref
    ``preprocess/generate_pseudo_depth_ego.py:15-59``).  Returns the number
    of frames written."""
    if predictor is None:
        predictor = _gray_predictor
    n = 0
    for dirpath, _, files in os.walk(rgb_root):
        jpgs = sorted(f for f in files if f.endswith(".jpg"))
        rel = os.path.relpath(dirpath, rgb_root)
        parts = [] if rel == "." else rel.split(os.sep)
        if not jpgs or rgb_dirname not in parts:
            continue
        # Substitute per path COMPONENT below rgb_root, never on the root
        # prefix — a raw str.replace corrupts output paths whenever the
        # root itself contains 'rgb'/'Color' (e.g. pytest tmpdirs named
        # after an rgb_* test).
        out_parts = [out_dirname if p == rgb_dirname
                     else out_prefix + p[len(rgb_prefix):]
                     if p.startswith(rgb_prefix) else p
                     for p in parts]
        out_dir = os.path.join(out_root, *out_parts)
        os.makedirs(out_dir, exist_ok=True)
        for f in jpgs:
            frame = np.asarray(Image.open(os.path.join(dirpath, f))
                               .convert("RGB"))
            depth = np.clip(predictor(frame), 0.0, 1.0)
            Image.fromarray((depth * 255).astype(np.uint8), "L").save(
                os.path.join(out_dir, f))
            n += 1
    return n


def midas_predictor(weights_path: Optional[str] = None):
    """Real MiDaS DPT_Large as a TPU predictor (``uint8 [H,W,3] ->
    float [H,W]`` in [0,1]).

    ``weights_path`` must point at the official checkpoint
    (``dpt_large-midas-2f21e586.pt``) fetched outside this image — the hub
    download itself is env-blocked (no network egress).  The architecture,
    converter, and resize protocol are all local
    (``ehgr_tpu/models/dpt.py``): frames scale to the nearest
    multiple-of-32 geometry at min-side 384 (MiDaS ``dpt_transform``
    semantics), run jitted (one compile per distinct frame geometry), and
    the inverse-depth map is min-max normalized per frame — matching the
    reference's JPEG quantization of relative depth
    (``preprocess/generate_pseudo_depth_ego.py``, via torchshow's
    per-image normalization)."""
    if weights_path is None or not os.path.isfile(weights_path):
        raise RuntimeError(
            "MiDaS DPT_Large weights are not bundled (no network egress). "
            "Download dpt_large-midas-2f21e586.pt elsewhere and pass "
            "weights_path=, or provide generate_pseudo_depth_tree(..., "
            "predictor=<your uint8[H,W,3] -> float[H,W] model>).")
    import torch

    import jax
    import jax.numpy as jnp

    from ehgr_tpu.models.dpt import convert_midas_state_dict, dpt_large

    sd = torch.load(weights_path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    model = dpt_large()
    variables = jax.jit(model.init)(
        {"params": jax.random.key(0)},
        jnp.zeros((1, 384, 384, 3), jnp.float32))
    variables, _ = convert_midas_state_dict(sd, variables)

    @jax.jit
    def run(x):                          # [1, H', W', 3] normalized
        return model.apply(variables, x)

    def predict(frame: np.ndarray) -> np.ndarray:
        h, w = frame.shape[:2]
        s = 384.0 / min(h, w)
        th = max(32, int(round(h * s / 32)) * 32)
        tw = max(32, int(round(w * s / 32)) * 32)
        x = jnp.asarray(frame, jnp.float32)[None] / 255.0
        x = jax.image.resize(x, (1, th, tw, 3), "bilinear")
        x = (x - 0.5) / 0.5
        inv = np.asarray(jax.image.resize(run(x), (1, h, w), "bilinear"))[0]
        lo, hi = float(inv.min()), float(inv.max())
        return (inv - lo) / (hi - lo) if hi > lo else np.zeros_like(inv)

    return predict
