"""Flow / RGBDiff modality support.

Reference: ``models/models.py:377-454`` — ``_construct_flow_model`` /
``_construct_diff_model`` rebuild the pretrained first conv for stacked-flow
(2L channels) or frame-difference (3L extra channels) inputs by averaging the
RGB kernel.  flax convs infer input width at init, so our models accept any
channel count natively; these helpers port pretrained RGB kernels across
modalities and compute the RGBDiff input itself.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict


def adapt_first_conv(params: Dict, new_in_channels: int,
                     keep_rgb: bool = False,
                     conv_path=("base_model", "conv1", "kernel")) -> Dict:
    """Re-derive the stem conv kernel for a different input width.

    Flow (ref :394-400): kernel = mean over the RGB input dim, tiled to the
    new width.  RGBDiff with ``keep_rgb`` (ref :434-445): original RGB slice
    concatenated with mean-tiles for the difference channels."""
    flat = flatten_dict(params)
    k = np.asarray(flat[tuple(conv_path)])        # [kh, kw, 3, out]
    mean_k = k.mean(axis=2, keepdims=True)
    if keep_rgb:
        extra = new_in_channels - k.shape[2]
        tiles = np.tile(mean_k, (1, 1, extra, 1))
        new_k = np.concatenate([k, tiles], axis=2)
    else:
        new_k = np.tile(mean_k, (1, 1, new_in_channels, 1))
    flat[tuple(conv_path)] = jnp.asarray(new_k, dtype=flat[tuple(conv_path)].dtype)
    return unflatten_dict(flat)


def rgb_diff(clip: jnp.ndarray, keep_rgb: bool = False) -> jnp.ndarray:
    """RGBDiff input: per-step frame differences along T
    (``models.py:358-375`` ``_get_diff`` semantics, channels-last).

    ``clip``: ``[N, T, H, W, 3]`` -> ``[N, T-1, H, W, 3]`` diffs, or with
    ``keep_rgb`` -> ``[N, T-1, H, W, 6]`` (frame + diff stacked)."""
    diff = clip[:, 1:] - clip[:, :-1]
    if keep_rgb:
        return jnp.concatenate([clip[:, :-1], diff], axis=-1)
    return diff


def stack_flow(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Stack x/y optical-flow fields into the 2-channel Flow modality input:
    ``[N, T, H, W] x 2 -> [N, T, H, W, 2]``."""
    return jnp.stack([u, v], axis=-1)
