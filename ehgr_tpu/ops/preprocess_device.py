"""On-device batched preprocessing (the TPU fast path).

The reference decodes + transforms frames one PIL image at a time inside
dataloader workers and is dataloader-bound (SURVEY.md §6: data_time is 30-50%
of the step).  On TPU we ship uint8 frames to the device and run the
resize / crop / normalize math batched under jit, where XLA fuses it with the
first conv.  Semantics mirror the live reference pipelines
(``train_mtmm.py:440-488``, ``test.py:204-233``): square bilinear resize for
EgoGesture, short-side resize + center crop for NvGesture, ImageNet
normalization.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_clip(x: jnp.ndarray,
                   mean: Sequence[float] = IMAGENET_MEAN,
                   std: Sequence[float] = IMAGENET_STD,
                   dtype=jnp.float32) -> jnp.ndarray:
    """uint8/float ``[..., H, W, C]`` -> normalized float ``[..., H, W, C]``.

    Folds /255, -mean, /std into one multiply-add (XLA fuses it with the
    consumer conv)."""
    mean = jnp.asarray(mean, dtype=jnp.float32)
    std = jnp.asarray(std, dtype=jnp.float32)
    scale = (1.0 / 255.0) / std
    bias = -mean / std
    return (x.astype(jnp.float32) * scale + bias).astype(dtype)


def resize_clip(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of ``[..., H, W, C]`` to ``size=(H', W')``."""
    out_shape = x.shape[:-3] + (size[0], size[1], x.shape[-1])
    return jax.image.resize(x.astype(jnp.float32), out_shape, method="bilinear")


def center_crop_clip(x: jnp.ndarray, crop: Tuple[int, int]) -> jnp.ndarray:
    """Static center crop of ``[..., H, W, C]``."""
    h, w = x.shape[-3], x.shape[-2]
    th, tw = crop
    y0 = int(round((h - th) / 2.0))
    x0 = int(round((w - tw) / 2.0))
    return x[..., y0:y0 + th, x0:x0 + tw, :]


@partial(jax.jit, static_argnames=("scale_size", "crop_size", "square_resize",
                                   "dtype_name"))
def preprocess_eval_batch(frames_u8: jnp.ndarray, *, scale_size: int = 224,
                          crop_size: int = 224, square_resize: bool = True,
                          dtype_name: str = "bfloat16") -> jnp.ndarray:
    """uint8 ``[N, T, H, W, 3]`` -> normalized ``[N, T, crop, crop, 3]``.

    ``square_resize=True`` = EgoGesture protocol (plain 224x224 resize,
    ``test.py:204-207``); otherwise resize-then-center-crop (NvGesture
    single-crop protocol)."""
    dtype = jnp.dtype(dtype_name)
    x = frames_u8
    if square_resize:
        if x.shape[-3] != crop_size or x.shape[-2] != crop_size:
            x = resize_clip(x, (crop_size, crop_size))
    else:
        h, w = x.shape[-3], x.shape[-2]
        short = min(h, w)
        nh, nw = (scale_size, int(round(scale_size * w / short))) \
            if h < w else (int(round(scale_size * h / short)), scale_size)
        x = resize_clip(x, (nh, nw))
        x = center_crop_clip(x, (crop_size, crop_size))
    return normalize_clip(x, dtype=dtype)


def bilinear_resize_torch(x: jnp.ndarray, out_h: int,
                          out_w: int) -> jnp.ndarray:
    """``F.interpolate(mode='bilinear', align_corners=False)`` equivalent for
    float ``[..., H, W, C]``: half-pixel source centers, fixed 2-tap triangle
    kernel, NO antialiasing on downsample.  ``jax.image.resize`` always
    antialiases when shrinking, so it diverges from the reference's depth
    target math (``train_mtmm.py:226-229``) at the 224->56 downsample; this
    gather-based version is bit-faithful to torch's algorithm."""
    h, w = x.shape[-3], x.shape[-2]

    def axis(n_in: int, n_out: int):
        i = jnp.arange(n_out, dtype=jnp.float32)
        src = jnp.clip((i + 0.5) * (n_in / n_out) - 0.5, 0.0, n_in - 1)
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_in - 1)
        return lo, hi, src - lo.astype(jnp.float32)

    ly, hy, fy = axis(h, out_h)
    lx, hx, fx = axis(w, out_w)
    fy = fy[:, None, None]
    top = jnp.take(x, ly, axis=-3) * (1.0 - fy) \
        + jnp.take(x, hy, axis=-3) * fy
    fx = fx[:, None]
    return jnp.take(top, lx, axis=-2) * (1.0 - fx) \
        + jnp.take(top, hx, axis=-2) * fx


def depth_to_target(depth_u8: jnp.ndarray, size: int = 56) -> jnp.ndarray:
    """uint8 depth ``[N, T, H, W, 1]`` -> float [0,1] targets resized to
    ``size``x``size`` (``train_mtmm.py:226-229``: non-antialiased bilinear
    to 56x56, torch-interpolate semantics)."""
    x = depth_u8.astype(jnp.float32) / 255.0
    if x.shape[-3] == size and x.shape[-2] == size:
        return x
    return bilinear_resize_torch(x, size, size)
