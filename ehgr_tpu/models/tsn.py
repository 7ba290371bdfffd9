"""TSN task models (flax): generic, MTMM, SD, MTMM+SD, and truncated deploys.

References (all under ``/root/reference/``):
* generic TSN       — ``models/models.py:13-477``
* TSN-MTMM          — ``models/models_MTMM.py:17-292``
* TSN-SD            — ``models/models_SD.py:104-431``
* TSN_Middle1/2/3   — ``models/models_SD.py:434-1232``
* TSN-MTMM-SD       — ``models/models_MTMM_SD.py:105-532``

Design: one backbone traversal produces every tap (the reference's MTMM+SD
forward runs its feature extractor twice, ``models_MTMM_SD.py:492`` — fixed
here).  Input is ``[N, T, H, W, C]``; frames fold into the batch as ``NT``
for the 2D backbone (the MXU sees one big conv batch), exits/consensus
un-fold back to ``[N, T, ...]``.

The reference's four near-clone 1200-line model files collapse into this one
module with static flags; ``variant()`` builds each surface:
  tsn          -> logits
  tsn_mtmm     -> (logits, depth[NT,56,56,1])
  tsn_sd       -> (logits, mid1, mid2, mid3, final_fea, f1, f2, f3)
  tsn_mtmm_sd  -> SD tuple + depth
  tsn_middleK  -> exit-K logits only (deployment truncation: deeper stages
                  are never traced, so XLA compiles only the truncated graph)
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ehgr_tpu.models.backbones import get_backbone, supports_taps
from ehgr_tpu.models.decoders import (GlobalDepthDecoder, Scala, TextEncoder,
                                      TransposedDecoder)
from ehgr_tpu.ops.consensus import consensus

_SCALA_WIDTHS = {1: (512, 1024, 2048), 2: (1024, 2048), 3: (2048,)}


def _head_init():
    """fc head init: weight ~ N(0, 0.001), bias 0 (models_MTMM.py:97-106)."""
    return dict(kernel_init=nn.initializers.normal(stddev=0.001),
                bias_init=nn.initializers.zeros)


class TSN(nn.Module):
    """Temporal Segment Network with optional MTMM / SD heads."""

    num_class: int
    num_segments: int
    base_model: str = "resnet50"
    temporal: str = "action"            # 'action' | 'tsm' | 'none'
    shift_div: int = 8
    consensus_type: str = "avg"
    # apply softmax per segment BEFORE consensus when False
    # (models.py:47-48, :351-353: only 'avg' consensus is legal then)
    before_softmax: bool = True
    # halve T after stage 2 (make_temporal_pool); consensus then runs at T/2
    temporal_pool: bool = False
    dropout: float = 0.5
    partial_bn: bool = True
    with_depth: bool = False            # MTMM global depth decoder (stage 1)
    with_sd: bool = False               # SD early exits
    # joint-stage modal surface (models_MTMM_SD.py:424-532): any of the 8
    # combinations of rgb / depth / skeleton / text; only used with with_sd
    modal: str = "rgb"
    truncate_at: int = 0                # 0 = full; 1/2/3 = TSN_MiddleK
    remat: bool = False                 # per-block activation remat
    # ActionConv kernel mode at inference: None (XLA) | 'prologue' | 'mega'
    # (resnet-family only; see ehgr_tpu/ops/pallas/action_mega.py)
    action_fused: Any = None
    # stages carrying the temporal module (ACTION placement ablation knob)
    action_stages: Any = (1, 2, 3, 4)
    # int8 MXU inference for backbone convs (ops/quantize.py; eval only):
    # False | True/'dynamic' | 'static' | 'calib'
    quantize: Any = False
    dtype: Any = jnp.float32

    def _consensus(self, logits_nt: jnp.ndarray) -> jnp.ndarray:
        seg = self.num_segments // 2 if self.temporal_pool \
            else self.num_segments
        if not self.before_softmax:
            logits_nt = jax.nn.softmax(logits_nt, axis=-1)
        x = logits_nt.reshape(-1, seg, logits_nt.shape[-1])
        return consensus(x, self.consensus_type)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_taps: bool = False):
        n, t = x.shape[0], x.shape[1]
        assert t == self.num_segments, (t, self.num_segments)
        x = x.reshape((n * t,) + x.shape[2:]).astype(self.dtype)

        if (self.with_sd or self.with_depth or self.truncate_at) and \
                not supports_taps(self.base_model):
            raise ValueError(
                f"{self.base_model} supports only the plain TSN surface "
                "(MTMM/SD need resnet-family layer taps, as in the reference)")
        backbone = get_backbone(
            self.base_model, temporal=self.temporal,
            n_segment=self.num_segments, shift_div=self.shift_div,
            partial_bn=self.partial_bn, dtype=self.dtype, remat=self.remat,
            temporal_pool=self.temporal_pool, action_fused=self.action_fused,
            action_stages=self.action_stages, quantize=self.quantize)
        # Truncated deploy models only trace the stages they keep
        # (models_SD.py:563-565: deeper layers become None).
        max_stage = self.truncate_at if self.truncate_at else 4
        taps = backbone(x, train=train, max_stage=max_stage)

        outs: Dict[str, jnp.ndarray] = {}

        if self.with_sd or self.truncate_at:
            for k in (1, 2, 3):
                if f"layer{k}" not in taps or (
                        self.truncate_at and k != self.truncate_at):
                    continue
                h = Scala(_SCALA_WIDTHS[k], dtype=self.dtype,
                          name=f"scala{k}")(taps[f"layer{k}"], train=train)
                h = jnp.mean(h, axis=(1, 2))                 # [NT, 2048]
                outs[f"mid{k}_fea"] = h
                logits = nn.Dense(self.num_class, dtype=self.dtype,
                                  name=f"middle_fc{k}",
                                  **_head_init())(h)
                outs[f"mid{k}"] = self._consensus(logits)

        if self.truncate_at:
            out = outs[f"mid{self.truncate_at}"].astype(jnp.float32)
            return (out, taps) if return_taps else out

        feat = taps["pool"]                                   # [NT, 2048]
        outs["final_fea"] = feat
        h = nn.Dropout(self.dropout, deterministic=not train)(feat)
        logits = nn.Dense(self.num_class, dtype=self.dtype, name="new_fc",
                          **_head_init())(h)
        output = self._consensus(logits)

        if self.with_depth:
            depth = GlobalDepthDecoder(dtype=self.dtype, name="global_decoder")(
                taps["layer4"], train=train)
            outs["depth"] = depth.astype(jnp.float32)

        if not self.with_sd and not self.with_depth:
            out = output.astype(jnp.float32)
            return (out, taps) if return_taps else out

        f32 = lambda v: v.astype(jnp.float32)
        if self.with_sd:
            sd = (f32(output), f32(outs["mid1"]), f32(outs["mid2"]),
                  f32(outs["mid3"]), f32(outs["final_fea"]),
                  f32(outs["mid1_fea"]), f32(outs["mid2_fea"]),
                  f32(outs["mid3_fea"]))
            # joint-stage modal heads, reference output order
            # (models_MTMM_SD.py:517-532): depth -> skeleton -> text
            extras = ()
            if "depth" in self.modal:
                local = TransposedDecoder((32,), 1, dtype=self.dtype,
                                          name="local_decoder")(
                    taps["stem"], train=train)
                glob = TransposedDecoder((256, 32), 1, dtype=self.dtype,
                                         name="global_decoder")(
                    taps["layer4"], train=train)
                extras += (f32(local), f32(glob))
            if "skeleton" in self.modal:
                lsk = TransposedDecoder((64,), 42, dtype=self.dtype,
                                        name="local_skel_decoder")(
                    taps["stem"], train=train)
                gsk = TransposedDecoder((256, 64), 42, dtype=self.dtype,
                                        name="global_skel_decoder")(
                    taps["layer4"], train=train)
                extras += (f32(lsk), f32(gsk))
            if "text" in self.modal:
                pooled = feat.reshape(-1, self.num_segments, feat.shape[-1])
                txt = TextEncoder(dtype=self.dtype, name="text_encoder")(
                    pooled, train=train)
                extras += (f32(txt),)
            if self.with_depth:   # legacy single-depth union (upsample dec)
                extras += (outs["depth"],)
            out = sd + extras if extras else sd
            return (out, taps) if return_taps else out
        out = (f32(output), outs["depth"])
        return (out, taps) if return_taps else out


def variant(arch: str, num_class: int, num_segments: int,
            base_model: str = "resnet50", temporal: str = "action",
            shift_div: int = 8, dropout: float = 0.5,
            partial_bn: bool = True, modal: str = "rgb_depth",
            remat: bool = False, action_fused: Any = None,
            action_stages: Any = (1, 2, 3, 4), quantize: Any = False,
            dtype: Any = jnp.float32) -> TSN:
    """Factory mapping the reference's model files to TSN flags."""
    kw = dict(num_class=num_class, num_segments=num_segments,
              base_model=base_model, temporal=temporal, shift_div=shift_div,
              dropout=dropout, partial_bn=partial_bn, remat=remat,
              action_fused=action_fused, action_stages=tuple(action_stages),
              quantize=quantize, dtype=dtype)
    if arch == "tsn":
        return TSN(**kw)
    if arch == "tsn_mtmm":
        return TSN(with_depth=True, **kw)
    if arch == "tsn_sd":
        return TSN(with_sd=True, **kw)
    if arch == "tsn_mtmm_sd":
        return TSN(with_sd=True, modal=modal, **kw)
    if arch.startswith("tsn_middle"):
        return TSN(truncate_at=int(arch[-1]), **kw)
    raise ValueError(f"unknown arch: {arch}")
