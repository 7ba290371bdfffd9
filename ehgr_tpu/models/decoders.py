"""Auxiliary heads: MTMM depth decoders and SD exit branches.

References:
* global depth decoder — ``/root/reference/models/models_MTMM.py:129-155``
  (conv3x3 + BN + ReLU + nearest x2 upsample stack, 2048->256->64->32->32->1,
  sigmoid; 7x7 layer4 features -> 56x56 depth).
* SepConv / scala exits — ``/root/reference/models/models_SD.py:81-101,
  216-253`` (two depthwise-separable stride-2 convs per SepConv; scalaN
  stacks bring layer1/2/3 features to 2048-d at 7x7).

Decoder/scala BNs sit OUTSIDE the reference's ``base_model`` so partial-BN
never freezes their statistics, while the optimizer-policy walk skips their
scale/bias (SURVEY.md §2.2) — replicated here via ``train``-driven stats and
the ``frozen_bn`` optimizer label in ``ehgr_tpu.train.optim``.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ehgr_tpu.models.norm import BatchNorm


def _upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor x2 on [NT, H, W, C] (nn.Upsample(scale_factor=2))."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


class GlobalDepthDecoder(nn.Module):
    """layer4 ``[NT, 7, 7, 2048]`` -> sigmoid depth ``[NT, 56, 56, 1]``."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        widths = (256, 64, 32)
        for i, w in enumerate(widths):
            x = nn.Conv(w, (3, 3), use_bias=False, padding="SAME",
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"bn{i}")(x)
            x = nn.relu(x)
            x = _upsample2x_nearest(x)
        x = nn.Conv(32, (3, 3), use_bias=False, padding="SAME",
                    dtype=self.dtype, name="conv3")(x)
        x = BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn3")(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), use_bias=True, dtype=self.dtype,
                    name="conv4")(x)
        return nn.sigmoid(x)


class TransposedDecoder(nn.Module):
    """ConvTranspose(k4,s2,p1) + BN stack ending in sigmoid — the MTMM+SD
    decoder family (``models_MTMM_SD.py:227-266``).  ``widths`` are the
    intermediate channel counts; ``out_features`` the final channels
    (1 = depth, 42 = skeleton heatmaps).  Each stage doubles the spatial
    size; no ReLUs (matching the reference exactly)."""

    widths: Sequence[int]          # e.g. (256, 32) global / (32,) local
    out_features: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, w in enumerate(self.widths):
            x = nn.ConvTranspose(w, (4, 4), strides=(2, 2),
                                 padding="SAME", use_bias=True,
                                 transpose_kernel=True, dtype=self.dtype,
                                 name=f"ct{i}")(x)
            x = BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"ctbn{i}")(x)
        x = nn.ConvTranspose(self.out_features, (4, 4), strides=(2, 2),
                             padding="SAME", use_bias=True,
                             transpose_kernel=True, dtype=self.dtype,
                             name=f"ct{len(self.widths)}")(x)
        return nn.sigmoid(x)


class TextEncoder(nn.Module):
    """Clip-level text-embedding head: Conv1d(2048 -> 512, kernel=T) + BN
    over pooled per-frame features (``models_MTMM_SD.py:268-272``).
    Input ``[N, T, 2048]`` -> ``[N, 512]``."""

    features: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        t = x.shape[1]
        x = nn.Conv(self.features, (t,), padding="VALID", use_bias=True,
                    dtype=self.dtype, name="conv")(x)       # [N, 1, 512]
        x = BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return x[:, 0, :]


class SepConv(nn.Module):
    """Depthwise-separable double conv: (dw k3 s2 + pw) + BN + ReLU +
    (dw k3 s1 + pw to ``features``) + BN + ReLU (ref models_SD.py:81-101)."""

    features: int
    stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_in = x.shape[-1]
        # explicit pad=1 (torch Conv2d(padding=1) semantics under stride 2)
        x = nn.Conv(c_in, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], feature_group_count=c_in,
                    use_bias=False, dtype=self.dtype, name="dw1")(x)
        x = nn.Conv(c_in, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pw1")(x)
        x = BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(c_in, (3, 3), padding="SAME", feature_group_count=c_in,
                    use_bias=False, dtype=self.dtype, name="dw2")(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pw2")(x)
        x = BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn2")(x)
        return nn.relu(x)


class Scala(nn.Module):
    """Stack of stride-2 SepConvs doubling channels to 2048
    (``scala1/2/3``, ref models_SD.py:216-253)."""

    widths: Sequence[int]          # e.g. (512, 1024, 2048) for scala1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, w in enumerate(self.widths):
            x = SepConv(w, dtype=self.dtype, name=f"sep{i}")(x, train=train)
        return x
