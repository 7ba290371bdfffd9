"""ResNet-50/101 backbone (flax, NHWC) with temporal-module injection.

Replaces the reference's runtime module surgery
(``make_temporal_shift``, ``/root/reference/models/action.py:179-230``, which
mutates ``block.conv1 = Action(conv1)`` on a torchvision ResNet) with a
constructor flag: ``temporal='action' | 'tsm' | 'none'`` decides what
``conv1`` of each bottleneck is at build time.  Same capability, no mutation,
and the whole network stays a pure function.

Architecture matches torchvision ResNet v1 exactly (stride on conv2, 1x1
downsample), so converted ImageNet / reference checkpoints are
logit-comparable.  Blocks are named ``layer{i}_{j}`` and params follow a
deterministic layout consumed by ``ehgr_tpu.models.torch_import``.

Every-other-block injection for >=23-block layer3 (ResNet-101) replicates
``action.py:208-218`` (``n_round=2``).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ehgr_tpu.models.norm import BatchNorm

from ehgr_tpu.ops.action import ActionConv, TSMConv

STAGE_SIZES = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
}


class Bottleneck(nn.Module):
    """torchvision Bottleneck (expansion 4), NHWC, optional temporal conv1."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    temporal: str = "none"        # what conv1 is: 'action' | 'tsm' | 'none'
    n_segment: int = 8
    shift_div: int = 8
    bn_frozen: bool = True        # partial-BN: freeze all non-stem BNs
    action_fused: object = None   # ActionConv kernel mode (None|'mega'|...)
    # int8 MXU inference for the block convs (ops/quantize.py):
    # False | True/'dynamic' | 'static' | 'calib'; training always takes
    # the float path, and the checkpointed params tree never changes
    quantize: object = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        ura = (not train) or self.bn_frozen

        def bn(name):
            return BatchNorm(use_running_average=ura, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name)

        if self.quantize:
            from ehgr_tpu.ops.quantize import QuantConv

            # True -> 'dynamic'; 'static'/'calib' pass through.  Training
            # always takes exact float math; 'calib' stays live at eval so
            # calibration applies (with mutable=['quant']) can record amax.
            q = "dynamic" if self.quantize is True else str(self.quantize)
            qmode = q if (q == "calib" or not train) else "float"

            declare = q in ("static", "calib")

            def conv(feats, k, name, strides=(1, 1), padding="SAME"):
                return lambda v: QuantConv(
                    feats, k, strides=strides, padding=padding,
                    dtype=self.dtype, name=name)(
                        v, mode=qmode, declare_scale=declare)
        else:
            def conv(feats, k, name, strides=(1, 1), padding="SAME"):
                return nn.Conv(feats, k, strides=strides, padding=padding,
                               use_bias=False, dtype=self.dtype, name=name)

        residual = x
        if self.temporal == "action":
            # ACTION's wrapped 1x1 deliberately stays FLOAT even under
            # quantize='static': measured 474 -> 329 clips/s when int8 —
            # the quantize of `gated` breaks XLA's fusion of the gated sum
            # into the matmul operand (docs/PERF.md).  ActionConv keeps the
            # capability as an explicit opt-in for future re-measurement.
            out = ActionConv(self.planes, n_segment=self.n_segment,
                             shift_div=self.shift_div, bn_frozen=self.bn_frozen,
                             fused=self.action_fused,
                             dtype=self.dtype, name="conv1")(x, train=train)
        elif self.temporal == "tsm":
            out = TSMConv(self.planes, n_segment=self.n_segment,
                          shift_div=self.shift_div, dtype=self.dtype,
                          name="conv1")(x, train=train)
        else:
            out = conv(self.planes, (1, 1), "conv1")(x)
        out = nn.relu(bn("bn1")(out))
        # explicit pad=1: torch semantics for stride-2 (SAME pads right-only)
        out = conv(self.planes, (3, 3), "conv2",
                   strides=(self.stride, self.stride),
                   padding=[(1, 1), (1, 1)])(out)
        out = nn.relu(bn("bn2")(out))
        out = conv(self.planes * 4, (1, 1), "conv3")(out)
        out = bn("bn3")(out)

        if self.has_downsample:
            residual = conv(self.planes * 4, (1, 1), "downsample_conv",
                            strides=(self.stride, self.stride))(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(out + residual)


class ResNetBackbone(nn.Module):
    """ResNet with per-stage feature taps.

    ``__call__`` returns a dict with keys ``stem`` (post-maxpool, the
    reference's ``maxpool`` tap), ``layer1..layer4``, and ``pool`` (global
    average, ``[NT, C]``) — one traversal serves TSN, MTMM (layer4 tap,
    ``models_MTMM.py:70-77``), and SD (per-stage exits,
    ``models_SD.py:364-431``)."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    temporal: str = "action"
    n_segment: int = 8
    shift_div: int = 8
    partial_bn: bool = True
    # rematerialize each block in the backward pass (jax.checkpoint): trades
    # ~30% extra forward FLOPs for O(#blocks) activation memory — lets large
    # clip batches train within one chip's HBM
    remat: bool = False
    # halve T after stage 2 with a stride-2 temporal max pool
    # (make_temporal_pool / TemporalPool, ref temporal_shift.py:157-176,
    # 179-184: later stages then run at T/2)
    temporal_pool: bool = False
    action_fused: object = None   # ActionConv kernel mode (None|'mega'|...)
    # stages that receive the temporal module (the ACTION paper's placement
    # accuracy/compute knob; (1,2,3,4) = every stage, the reference default)
    action_stages: Sequence[int] = (1, 2, 3, 4)
    # int8 MXU inference for block convs (stem/head stay float — standard
    # quantization practice; see ops/quantize.py):
    # False | True/'dynamic' | 'static' | 'calib'
    quantize: object = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 max_stage: int = 4) -> Dict[str, jnp.ndarray]:
        # stem — the one BN that stays live under partial-BN
        # (models_MTMM.py:159-175)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        taps: Dict[str, jnp.ndarray] = {"stem": x}
        planes = (64, 128, 256, 512)
        # static_argnums counts self as 0: (x, train) -> train at 2
        block_cls = nn.remat(Bottleneck, static_argnums=(2,)) if self.remat \
            else Bottleneck
        # ACTION goes on every block; every-other for >=23-block stages
        # (action.py:208-218)
        seg = self.n_segment
        for i, (n_blocks, p) in enumerate(zip(self.stage_sizes, planes), 1):
            if i > max_stage:
                # deployment truncation (TSN_MiddleK, models_SD.py:563-565):
                # deeper stages are never traced or compiled
                return taps
            n_round = 2 if n_blocks >= 23 else 1
            for j in range(n_blocks):
                stride = 2 if (i > 1 and j == 0) else 1
                temporal = self.temporal if (
                    j % n_round == 0 and i in self.action_stages) else "none"
                x = block_cls(
                    planes=p, stride=stride, has_downsample=(j == 0),
                    temporal=temporal, n_segment=seg,
                    shift_div=self.shift_div, bn_frozen=self.partial_bn,
                    action_fused=self.action_fused, quantize=self.quantize,
                    dtype=self.dtype, name=f"layer{i}_{j}")(x, train)
            taps[f"layer{i}"] = x
            if self.temporal_pool and i == 2:
                from ehgr_tpu.ops.temporal_shift import temporal_pool

                nt, hh, ww, cc = x.shape
                x5 = x.reshape(nt // seg, seg, hh, ww, cc)
                x = temporal_pool(x5).reshape(-1, hh, ww, cc)
                seg //= 2

        taps["pool"] = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1)
        return taps


# (backbone construction lives in ehgr_tpu.models.backbones.get_backbone)
