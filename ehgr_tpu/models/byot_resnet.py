"""Standalone BYOT self-distillation ResNet (image-level).

Reference: ``/root/reference/models/resnet.py:105-349`` — an orphan module
(imported by nothing) carrying the original BYOT design: attention-gated
early exits (SepConv + BN + ReLU + bilinear x2 upsample + sigmoid mask per
stage, :226-258) feeding scala reducers + per-exit fc heads (:199-263).
Implemented here as a working model: the forward returns all four exits and
features (the orphan returns only ``out4`` and contains stray prints —
fixed, not copied).

Video self-distillation lives in ``ehgr_tpu.models.tsn`` (TSN-SD); this
class provides the image-classification BYOT capability for completeness.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ehgr_tpu.models.norm import BatchNorm

from ehgr_tpu.models.decoders import SepConv
from ehgr_tpu.models.resnet import Bottleneck


def _upsample2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), method="bilinear")


class _Attention(nn.Module):
    """SepConv(C->C, stride 2) + BN + ReLU + bilinear x2 + sigmoid mask."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        c = x.shape[-1]
        h = SepConv(c, dtype=self.dtype, name="sep")(x, train=train)
        h = BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(h)
        h = nn.relu(h)
        h = _upsample2x_bilinear(h)
        return nn.sigmoid(h)


class BYOTResNet(nn.Module):
    """ResNet-50-style BYOT image classifier with attention-gated exits."""

    num_class: int
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple:
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        feas = []
        planes = (64, 128, 256, 512)
        for i, (n_blocks, p) in enumerate(zip(self.stage_sizes, planes), 1):
            for j in range(n_blocks):
                stride = 2 if (i > 1 and j == 0) else 1
                x = Bottleneck(planes=p, stride=stride,
                               has_downsample=(j == 0), temporal="none",
                               bn_frozen=False, dtype=self.dtype,
                               name=f"layer{i}_{j}")(x, train=train)
            if i < 4:
                att = _Attention(dtype=self.dtype, name=f"attention{i}")(
                    x, train=train)
                feas.append(att * x)
            else:
                feas.append(x)

        widths = {1: (512, 1024, 2048), 2: (1024, 2048), 3: (2048,)}
        outs, features = [], []
        for i, fea in enumerate(feas, 1):
            h = fea
            if i < 4:
                for k, wd in enumerate(widths[i]):
                    h = SepConv(wd, dtype=self.dtype,
                                name=f"scala{i}_sep{k}")(h, train=train)
            pooled = jnp.mean(h, axis=(1, 2))
            features.append(pooled.astype(jnp.float32))
            logits = nn.Dense(self.num_class, dtype=self.dtype,
                              name=f"fc{i}")(pooled)
            outs.append(logits.astype(jnp.float32))
        # (out1..out4, fea1..fea4) — deepest head (out4) is the teacher
        return tuple(outs) + tuple(features)
