"""Res2Net-50 (26w x 4s) backbone (flax, NHWC) with working ACTION wiring.

Reference: ``/root/reference/archs/res2net.py:19-235``.  The reference's
temporal wiring for Res2Net imports a module that does not exist
(``models/temporal_shift_res2net``, ``models/models.py:140-147``) so
``is_shift`` res2net is BROKEN there; here the ACTION module wraps each
Bottle2neck's ``conv1`` exactly like the ResNet path — providing the
capability the reference lost (SURVEY.md known defects).

Bottle2neck semantics replicated: width = floor(planes*26/64), scale 4,
hierarchical 3x3 convs over width-slices with additive reuse ('normal') or
fresh slices + avg-pooled tail ('stage'), 1x1 in/out convs, stride on the
3x3s.  Returns the same tap dict as the ResNet backbone, so TSN / MTMM / SD
heads (2048-d layer4) work unchanged.
"""

from __future__ import annotations

import math
from typing import Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ehgr_tpu.models.norm import BatchNorm

from ehgr_tpu.ops.action import ActionConv, TSMConv


def _avg_pool_3x3(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """AvgPool2d(k=3, stride, padding=1) with torch count_include_pad=True."""
    return nn.pooling.avg_pool(
        x, (3, 3), strides=(stride, stride), padding=[(1, 1), (1, 1)],
        count_include_pad=True)


class Bottle2neck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    stype: str = "normal"            # 'stage' = first block of a stage
    base_width: int = 26
    scale: int = 4
    temporal: str = "none"
    n_segment: int = 8
    shift_div: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        width = int(math.floor(self.planes * (self.base_width / 64.0)))
        ws = width * self.scale

        def bn(name):
            return BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name)

        residual = x
        if self.temporal == "action":
            out = ActionConv(ws, n_segment=self.n_segment,
                             shift_div=self.shift_div, dtype=self.dtype,
                             name="conv1")(x, train=train)
        elif self.temporal == "tsm":
            out = TSMConv(ws, n_segment=self.n_segment,
                          shift_div=self.shift_div, dtype=self.dtype,
                          name="conv1")(x, train=train)
        else:
            out = nn.Conv(ws, (1, 1), use_bias=False, dtype=self.dtype,
                          name="conv1")(x)
        out = nn.relu(bn("bn1")(out))

        nums = 1 if self.scale == 1 else self.scale - 1
        spx = [out[..., i * width:(i + 1) * width] for i in range(self.scale)]
        pieces = []
        sp = None
        for i in range(nums):
            sp = spx[i] if (i == 0 or self.stype == "stage") else sp + spx[i]
            sp = nn.Conv(width, (3, 3), strides=(self.stride, self.stride),
                         padding=[(1, 1), (1, 1)], use_bias=False,
                         dtype=self.dtype, name=f"convs_{i}")(sp)
            sp = nn.relu(bn(f"bns_{i}")(sp))
            pieces.append(sp)
        if self.scale != 1:
            tail = spx[nums]
            if self.stype == "stage":
                tail = _avg_pool_3x3(tail, self.stride)
            pieces.append(tail)
        out = jnp.concatenate(pieces, axis=-1)

        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = bn("bn3")(out)

        if self.has_downsample:
            residual = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(out + residual)


class Res2NetBackbone(nn.Module):
    """res2net50_26w_4s with the same tap-dict contract as ResNetBackbone."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    temporal: str = "none"
    n_segment: int = 8
    shift_div: int = 8
    partial_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 max_stage: int = 4) -> Dict[str, jnp.ndarray]:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        taps: Dict[str, jnp.ndarray] = {"stem": x}
        planes = (64, 128, 256, 512)
        for i, (n_blocks, p) in enumerate(zip(self.stage_sizes, planes), 1):
            if i > max_stage:
                return taps
            for j in range(n_blocks):
                stride = 2 if (i > 1 and j == 0) else 1
                x = Bottle2neck(
                    planes=p, stride=stride, has_downsample=(j == 0),
                    stype="stage" if j == 0 else "normal",
                    temporal=self.temporal, n_segment=self.n_segment,
                    shift_div=self.shift_div, dtype=self.dtype,
                    name=f"layer{i}_{j}")(x, train=train)
            taps[f"layer{i}"] = x
        taps["pool"] = jnp.mean(x, axis=(1, 2))
        return taps
