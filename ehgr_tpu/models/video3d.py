"""3D-conv video models: R(2+1)D-18 (+MTMM depth decoder) and SlowOnly-R50.

References:
* R(2+1)D-18 — torchvision ``r2plus1d_18`` as consumed by
  ``/root/reference/models/models_r2plus1d.py:9-34`` (dropout-0.5 head);
  factorized (2+1)D convs with the canonical mid-plane formula.
* R(2+1)D-18-MTMM — ``models_r2plus1d.py:25-92``: ConvTranspose3d global
  depth decoder over layer4 ``[N,512,1,14,14] -> [N,8,1,56,56]`` per the
  layer list at :59-85 (note it ends in BN+ReLU, not sigmoid).
* SlowOnly-R50 — pytorchvideo ``slow_r50`` as used by
  ``train_slowonly.py:495-497`` (proj replaced with a 2048 -> num_class
  linear): 3D ResNet-50, 1x7x7 stem, temporal kernel 1 in res2/res3 and 3 in
  res4/res5, no temporal downsampling (SlowFast Slow pathway).

Layout: ``[N, T, H, W, C]`` (NDHWC) end-to-end; inputs come straight from the
``[N, T, H, W, C]`` pipeline with no permutes (the reference permutes to
NCTHW at every trainer, ``train_slowonly.py:191``).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ehgr_tpu.models.norm import BatchNorm


def _bn(dtype, name, train):
    return BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


def _conv3d(features, kernel, stride, name, dtype, bias=False):
    pad = [((k - 1) // 2, (k - 1) // 2) for k in kernel]
    return nn.Conv(features, kernel, strides=stride, padding=pad,
                   use_bias=bias, dtype=dtype, name=name)


def _midplanes(c_in: int, c_out: int) -> int:
    """torchvision Conv2Plus1D intermediate width."""
    return (c_in * c_out * 3 * 3 * 3) // (c_in * 3 * 3 + 3 * c_out)


class Conv2Plus1D(nn.Module):
    """(1,3,3) spatial -> BN+ReLU -> (3,1,1) temporal factorized conv."""

    features: int
    stride: Tuple[int, int, int] = (1, 1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        mid = _midplanes(x.shape[-1], self.features)
        st, sh, sw = self.stride
        x = _conv3d(mid, (1, 3, 3), (1, sh, sw), "spatial", self.dtype)(x)
        x = nn.relu(_bn(self.dtype, "bn", train)(x))
        return _conv3d(self.features, (3, 1, 1), (st, 1, 1), "temporal",
                       self.dtype)(x)


class R2Plus1DBlock(nn.Module):
    features: int
    stride: Tuple[int, int, int] = (1, 1, 1)
    has_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        residual = x
        h = Conv2Plus1D(self.features, self.stride, dtype=self.dtype,
                        name="conv1")(x, train=train)
        h = nn.relu(_bn(self.dtype, "bn1", train)(h))
        h = Conv2Plus1D(self.features, dtype=self.dtype,
                        name="conv2")(h, train=train)
        h = _bn(self.dtype, "bn2", train)(h)
        if self.has_downsample:
            residual = _conv3d(self.features, (1, 1, 1), self.stride,
                               "downsample_conv", self.dtype)(x)
            residual = _bn(self.dtype, "downsample_bn", train)(residual)
        return nn.relu(h + residual)


class R2Plus1D18(nn.Module):
    """torchvision-architecture R(2+1)D-18 clip classifier."""

    num_class: int
    dropout: float = 0.5
    with_depth: bool = False        # MTMM variant
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        # stem: (1,7,7)/1,2,2 -> 45ch -> (3,1,1) -> 64ch
        h = _conv3d(45, (1, 7, 7), (1, 2, 2), "stem_spatial", self.dtype)(x)
        h = nn.relu(_bn(self.dtype, "stem_bn1", train)(h))
        h = _conv3d(64, (3, 1, 1), (1, 1, 1), "stem_temporal", self.dtype)(h)
        h = nn.relu(_bn(self.dtype, "stem_bn2", train)(h))

        taps: Dict[str, jnp.ndarray] = {}
        for i, planes in enumerate((64, 128, 256, 512), 1):
            for j in range(2):
                stride = (2, 2, 2) if (i > 1 and j == 0) else (1, 1, 1)
                h = R2Plus1DBlock(planes, stride, has_downsample=(
                    i > 1 and j == 0), dtype=self.dtype,
                    name=f"layer{i}_{j}")(h, train=train)
            taps[f"layer{i}"] = h

        pooled = jnp.mean(h, axis=(1, 2, 3))                # [N, 512]
        pooled = nn.Dropout(self.dropout, deterministic=not train)(pooled)
        logits = nn.Dense(self.num_class, dtype=self.dtype,
                          name="fc")(pooled).astype(jnp.float32)
        if not self.with_depth:
            return logits

        # global 3D depth decoder (models_r2plus1d.py:59-92)
        d = taps["layer4"]                                   # [N,1,14,14,512]
        for k, (feats, kern, st) in enumerate((
                (256, (4, 4, 4), (2, 2, 2)),
                (128, (4, 4, 4), (2, 2, 2)),
                (64, (4, 1, 1), (2, 1, 1)))):
            d = nn.ConvTranspose(feats, kern, strides=st, padding="SAME",
                                 transpose_kernel=True, use_bias=False,
                                 dtype=self.dtype, name=f"dec_ct{k}")(d)
            d = nn.relu(_bn(self.dtype, f"dec_ctbn{k}", train)(d))
        for k, feats in enumerate((32, 1)):
            d = _conv3d(feats, (3, 3, 3), (1, 1, 1), f"dec_conv{k}",
                        self.dtype)(d)
            d = nn.relu(_bn(self.dtype, f"dec_bn{k}", train)(d))
        # [N, 8, 56, 56, 1] — the reference's [N,8,1,56,56] permuted to NDHWC
        return logits, d.astype(jnp.float32)


class SlowOnlyBottleneck(nn.Module):
    planes: int
    t_kernel: int = 1               # temporal kernel on conv1 (1 or 3)
    stride: int = 1                 # spatial only; no temporal downsampling
    has_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        residual = x
        h = _conv3d(self.planes, (self.t_kernel, 1, 1), (1, 1, 1),
                    "conv1", self.dtype)(x)
        h = nn.relu(_bn(self.dtype, "bn1", train)(h))
        h = _conv3d(self.planes, (1, 3, 3), (1, self.stride, self.stride),
                    "conv2", self.dtype)(h)
        h = nn.relu(_bn(self.dtype, "bn2", train)(h))
        h = _conv3d(self.planes * 4, (1, 1, 1), (1, 1, 1), "conv3",
                    self.dtype)(h)
        h = _bn(self.dtype, "bn3", train)(h)
        if self.has_downsample:
            residual = _conv3d(self.planes * 4, (1, 1, 1),
                               (1, self.stride, self.stride),
                               "downsample_conv", self.dtype)(x)
            residual = _bn(self.dtype, "downsample_bn", train)(residual)
        return nn.relu(h + residual)


class SlowOnlyR50(nn.Module):
    """SlowFast's Slow pathway at R50 depth (``slow_r50``)."""

    num_class: int
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        h = _conv3d(64, (1, 7, 7), (1, 2, 2), "stem_conv", self.dtype)(x)
        h = nn.relu(_bn(self.dtype, "stem_bn", train)(h))
        h = nn.max_pool(h, (1, 3, 3), strides=(1, 2, 2),
                        padding=[(0, 0), (1, 1), (1, 1)])

        stage_blocks = (3, 4, 6, 3)
        t_kernels = (1, 1, 3, 3)    # SlowFast: temporal convs only res4/5
        for i, (n, tk) in enumerate(zip(stage_blocks, t_kernels), 1):
            planes = 64 * (2 ** (i - 1))
            for j in range(n):
                stride = 2 if (i > 1 and j == 0) else 1
                h = SlowOnlyBottleneck(
                    planes, t_kernel=tk, stride=stride,
                    has_downsample=(j == 0), dtype=self.dtype,
                    name=f"layer{i}_{j}")(h, train=train)

        pooled = jnp.mean(h, axis=(1, 2, 3))
        pooled = nn.Dropout(self.dropout, deterministic=not train)(pooled)
        return nn.Dense(self.num_class, dtype=self.dtype,
                        name="proj")(pooled).astype(jnp.float32)
