"""BN-Inception backbone (flax, NHWC) with ACTION/TSM gates at block entries.

References: architecture ``/root/reference/archs/bn_inception.py:10-657``
(Caffe-converted GoogLeNet-BN: channel table extracted structurally from the
class; BGR input, mean [104,117,128], std 1 — handled by the data config,
``pretrained_settings``); ACTION insertion points
``archs/bn_inception_action.py:154-167`` (10 wrappers, ``shift_2`` through
``shift_5a``, at the entries of conv2 and every inception block after the
first).  The reference's own temporal forward is dead code (pdb landmines,
``:227-242``); here the gates apply to each block's input, which is the
coherent form of the same design.

Block pattern: four branches concat'd as [1x1, 3x3, double-3x3, pool-proj];
downsample blocks (3c, 4e) drop the 1x1/pool-proj branches and concat the
stride-2 max-pooled input instead.  All pools are ceil-mode (Caffe).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ehgr_tpu.models.norm import BatchNorm

from ehgr_tpu.ops.action import ActionGate
from ehgr_tpu.ops.temporal_shift import temporal_shift

# (1x1, 3x3_reduce, 3x3, d3x3_reduce, d3x3_1, d3x3_2, pool_proj, pool, stride)
# extracted from archs/bn_inception.py (None = branch absent)
_BLOCKS: Tuple[Tuple[str, tuple], ...] = (
    ("3a", (64, 64, 64, 64, 96, 96, 32, "avg", 1)),
    ("3b", (64, 64, 96, 64, 96, 96, 64, "avg", 1)),
    ("3c", (None, 128, 160, 64, 96, 96, None, "max", 2)),
    ("4a", (224, 64, 96, 96, 128, 128, 128, "avg", 1)),
    ("4b", (192, 96, 128, 96, 128, 128, 128, "avg", 1)),
    ("4c", (160, 128, 160, 128, 160, 160, 128, "avg", 1)),
    ("4d", (96, 128, 192, 160, 192, 192, 128, "avg", 1)),
    ("4e", (None, 128, 192, 192, 256, 256, None, "max", 2)),
    ("5a", (352, 192, 320, 160, 224, 224, 128, "avg", 1)),
    ("5b", (352, 192, 320, 192, 224, 224, 128, "max", 1)),
)
# stage tap boundaries for feature access (3x = 56^2/320ch ... 5b = 7^2/1024)
BGR_MEAN = (104.0, 117.0, 128.0)


def _max_pool_ceil(x, k=3, s=2):
    """MaxPool2d(k, s, padding=0, ceil_mode=True): asymmetric right-pad."""
    h, w = x.shape[-3], x.shape[-2]
    oh = -(-(h - k) // s) + 1
    ow = -(-(w - k) // s) + 1
    ph = max(0, (oh - 1) * s + k - h)
    pw = max(0, (ow - 1) * s + k - w)
    return nn.max_pool(x, (k, k), strides=(s, s),
                       padding=[(0, ph), (0, pw)])


def _avg_pool_3x3_s1(x):
    """AvgPool2d(3, 1, padding=1, count_include_pad=True) (Caffe)."""
    return nn.pooling.avg_pool(x, (3, 3), strides=(1, 1),
                               padding=[(1, 1), (1, 1)],
                               count_include_pad=True)


def _max_pool_3x3_s1(x):
    return nn.max_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)])


class _ConvBnRelu(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        p = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(p, p), (p, p)], use_bias=True,
                    dtype=self.dtype, name="conv")(x)
        x = BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class InceptionBlock(nn.Module):
    spec: tuple
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        b1, r3, o3, rd, d1, d2, pp, pool, stride = self.spec
        cbr = lambda f, k, s, name: _ConvBnRelu(
            f, k, s, dtype=self.dtype, name=name)
        branches = []
        if b1 is not None:
            branches.append(cbr(b1, 1, 1, "b1x1")(x, train=train))
        h = cbr(r3, 1, 1, "b3x3_reduce")(x, train=train)
        branches.append(cbr(o3, 3, stride, "b3x3")(h, train=train))
        h = cbr(rd, 1, 1, "bd3x3_reduce")(x, train=train)
        h = cbr(d1, 3, 1, "bd3x3_1")(h, train=train)
        branches.append(cbr(d2, 3, stride, "bd3x3_2")(h, train=train))
        if stride == 2:
            branches.append(_max_pool_ceil(x))
        else:
            p = _avg_pool_3x3_s1(x) if pool == "avg" else _max_pool_3x3_s1(x)
            branches.append(cbr(pp, 1, 1, "bpool_proj")(p, train=train))
        return jnp.concatenate(branches, axis=-1)


class BNInceptionBackbone(nn.Module):
    """Returns {'pool': [NT, 1024], 'final': ...} — plain TSN surface."""

    temporal: str = "none"          # 'action' | 'tsm' | 'none'
    n_segment: int = 8
    shift_div: int = 8
    partial_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    def _gate(self, x, name, train):
        if self.temporal == "action":
            return ActionGate(self.n_segment, self.shift_div,
                              dtype=self.dtype, name=name)(x, train=train)
        if self.temporal == "tsm":
            nt, h, w, c = x.shape
            x5 = x.reshape(nt // self.n_segment, self.n_segment, h, w, c)
            return temporal_shift(x5, self.shift_div).reshape(nt, h, w, c)
        return x

    @nn.compact
    def __call__(self, x, train: bool = False,
                 max_stage: int = 4) -> Dict[str, jnp.ndarray]:
        x = _ConvBnRelu(64, 7, 2, dtype=self.dtype, name="conv1")(
            x, train=train)
        x = _max_pool_ceil(x)
        x = _ConvBnRelu(64, 1, 1, dtype=self.dtype, name="conv2_reduce")(
            x, train=train)
        x = _ConvBnRelu(192, 3, 1, dtype=self.dtype, name="conv2")(
            x, train=train)
        x = _max_pool_ceil(x)

        taps: Dict[str, jnp.ndarray] = {"stem": x}
        # Reference placement (bn_inception_action.py:154-167,178-199): each
        # wrapper gates the PREVIOUS block's output — i.e. every inception
        # block's input, named after the producer: shift_2 gates 3a's input
        # (block-2 output, 192ch), shift_3a gates 3b's input, ... shift_5a
        # gates 5b's input.  Parity-pinned by test_reference_parity.
        gate_names = ("shift_2", "shift_3a", "shift_3b", "shift_3c",
                      "shift_4a", "shift_4b", "shift_4c", "shift_4d",
                      "shift_4e", "shift_5a")
        for i, (bname, spec) in enumerate(_BLOCKS):
            x = self._gate(x, gate_names[i], train)
            x = InceptionBlock(spec, dtype=self.dtype,
                               name=f"inception_{bname}")(x, train=train)
        taps["final"] = x
        taps["pool"] = jnp.mean(x, axis=(1, 2))
        return taps
