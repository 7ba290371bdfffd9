"""Model factory: Config -> model instance for every family (the dispatch
the reference spreads across trainer scripts)."""

from __future__ import annotations

import jax.numpy as jnp

from ehgr_tpu.configs import ModelConfig
from ehgr_tpu.models.tsn import variant
from ehgr_tpu.models.video3d import R2Plus1D18, SlowOnlyR50


def build_model(m: ModelConfig):
    dtype = jnp.dtype(m.dtype)
    if m.arch == "slowonly":
        return SlowOnlyR50(num_class=m.num_classes, dropout=m.dropout,
                           dtype=dtype)
    if m.arch == "r2plus1d":
        return R2Plus1D18(num_class=m.num_classes, dropout=m.dropout,
                          dtype=dtype)
    if m.arch == "r2plus1d_mtmm":
        return R2Plus1D18(num_class=m.num_classes, dropout=m.dropout,
                          with_depth=True, dtype=dtype)
    if m.arch == "videomae":
        from ehgr_tpu.models.videomae import VideoMAE
        size = {}
        if m.vit:
            size = dict(zip(("dim", "depth", "heads"), m.vit))
        return VideoMAE(num_class=m.num_classes, dropout=m.dropout,
                        dtype=dtype, **size)
    model = variant(m.arch, num_class=m.num_classes,
                    num_segments=m.num_segments, base_model=m.base_model,
                    temporal=(m.temporal_module if m.is_shift else "none"),
                    shift_div=m.shift_div, dropout=m.dropout,
                    partial_bn=m.partial_bn, modal=m.modal,
                    remat=getattr(m, "remat", False),
                    action_fused=(m.action_fused or None),
                    action_stages=tuple(getattr(m, "action_stages",
                                                (1, 2, 3, 4))),
                    dtype=dtype)
    # (quantize is deliberately NOT passed here: build_model serves the
    # trainers, and int8 inference is eval-only — the eval runner's
    # _build_model applies it, with calibration.  ops/quantize.py.)
    if m.temporal_pool or not m.before_softmax:
        import dataclasses as _dc
        model = _dc.replace(model, temporal_pool=m.temporal_pool,
                            before_softmax=m.before_softmax)
    return model
