"""MobileNetV2 backbone (flax, NHWC) with ACTION injection.

Reference: ``/root/reference/archs/mobilenet_v2.py:28-143`` (width-mult-1
MobileNetV2) + the TSN wiring ``models/models.py:169-194``: when shifting,
``Action`` wraps ``conv[0]`` — the 1x1 expand conv — of every
residual-connected InvertedResidual with expand_ratio != 1.

Param layout mirrors the torch Sequential indices (``features.{i}.conv.{j}``)
via the naming scheme consumed by ``ehgr_tpu.models.torch_import``:
``features_{i}`` blocks, ``conv_{j}`` layers inside inverted residuals,
``c{j}`` inside plain conv+bn blocks.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ehgr_tpu.models.norm import BatchNorm

from ehgr_tpu.ops.action import ActionConv

# t (expand), c (out), n (repeat), s (stride) — mobilenet_v2.py:77-85
_SETTING: Tuple[Tuple[int, int, int, int], ...] = (
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
)


def _relu6(x):
    return jnp.minimum(nn.relu(x), 6.0)


class _ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)], use_bias=False,
                    dtype=self.dtype, name="c0")(x)
        x = BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="c1")(x)
        return _relu6(x)


class InvertedResidual(nn.Module):
    features: int
    stride: int
    expand_ratio: int
    temporal: str = "none"          # 'action' on conv_0 when res-connected
    n_segment: int = 8
    shift_div: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        c_in = x.shape[-1]
        hidden = c_in * self.expand_ratio
        use_res = self.stride == 1 and c_in == self.features

        def bn(i):
            return BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype,
                                name=f"conv_{i}")

        h = x
        j = 0
        if self.expand_ratio != 1:
            # pw expand — the ACTION insertion point (models.py:181-186)
            if self.temporal == "action" and use_res:
                h = ActionConv(hidden, n_segment=self.n_segment,
                               shift_div=self.shift_div, dtype=self.dtype,
                               name="conv_0")(h, train=train)
            else:
                h = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype,
                            name="conv_0")(h)
            h = _relu6(bn(1)(h))
            j = 3
        # dw
        h = nn.Conv(hidden, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], feature_group_count=hidden,
                    use_bias=False, dtype=self.dtype, name=f"conv_{j}")(h)
        h = _relu6(bn(j + 1)(h))
        # pw-linear
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name=f"conv_{j + 3}")(h)
        h = bn(j + 4)(h)
        return x + h if use_res else h


class MobileNetV2Backbone(nn.Module):
    """Returns {'pool': [NT, 1280]} — mobilenetv2 supports the plain TSN
    surface (the reference's MTMM/SD models are resnet-only)."""

    temporal: str = "none"
    n_segment: int = 8
    shift_div: int = 8
    partial_bn: bool = False        # kept for factory uniformity
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False,
                 max_stage: int = 4) -> Dict[str, jnp.ndarray]:
        x = _ConvBN(32, 3, 2, dtype=self.dtype, name="features_0")(
            x, train=train)
        i = 1
        for t, c, n, s in _SETTING:
            for k in range(n):
                x = InvertedResidual(
                    c, s if k == 0 else 1, t, temporal=self.temporal,
                    n_segment=self.n_segment, shift_div=self.shift_div,
                    dtype=self.dtype, name=f"features_{i}")(x, train=train)
                i += 1
        x = _ConvBN(1280, 1, 1, dtype=self.dtype, name=f"features_{i}")(
            x, train=train)
        return {"pool": jnp.mean(x, axis=(1, 2)), "final": x}
