"""Backbone factory — the string dispatch of ``models.py:106-212`` as a
registry.  Every backbone returns the tap-dict contract
(``stem / layer1..4 / pool``; non-resnet families provide at least ``pool``).
MTMM/SD heads require the resnet-family taps (2048-d layer4), matching the
reference where those model files are resnet-only."""

from __future__ import annotations

import jax.numpy as jnp

from ehgr_tpu.models.bn_inception import BNInceptionBackbone
from ehgr_tpu.models.mobilenet_v2 import MobileNetV2Backbone
from ehgr_tpu.models.res2net import Res2NetBackbone
from ehgr_tpu.models.resnet import STAGE_SIZES, ResNetBackbone

RESNET_FAMILY = ("resnet50", "resnet101", "res2net50")
ALL_BACKBONES = RESNET_FAMILY + ("mobilenet_v2", "bn_inception")


def get_backbone(base_model: str, temporal: str, n_segment: int,
                 shift_div: int, partial_bn: bool, dtype: jnp.dtype,
                 remat: bool = False, temporal_pool: bool = False,
                 action_fused=None, action_stages=(1, 2, 3, 4),
                 quantize: bool = False):
    kw = dict(temporal=temporal, n_segment=n_segment, shift_div=shift_div,
              partial_bn=partial_bn, dtype=dtype, name="base_model")
    if base_model in STAGE_SIZES:
        return ResNetBackbone(stage_sizes=STAGE_SIZES[base_model],
                              remat=remat, temporal_pool=temporal_pool,
                              action_fused=action_fused,
                              action_stages=tuple(action_stages),
                              quantize=quantize, **kw)
    if quantize:
        raise ValueError("int8 inference is resnet-only for now")
    if temporal_pool:
        raise ValueError("temporal_pool is resnet-only (as in the reference)")
    if base_model in ("res2net50", "res2net50_26w_4s"):
        return Res2NetBackbone(**kw)
    if base_model in ("mobilenet_v2", "mobilenetv2"):
        return MobileNetV2Backbone(**kw)
    if base_model in ("bn_inception", "BNInception"):
        return BNInceptionBackbone(**kw)
    raise ValueError(f"unknown base model: {base_model}")


def supports_taps(base_model: str) -> bool:
    """Whether the backbone exposes layer1..4 taps (needed by MTMM/SD)."""
    return base_model in RESNET_FAMILY or base_model in ("res2net50_26w_4s",)
