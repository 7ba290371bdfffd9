"""Test-protocol runners — the ``test.py`` / ``test_sd.py`` verbs.

Replicates the reference evaluation (``test.py:117-166``, ``test_sd.py``):
multi-clip voting, top-1/5, confusion matrices (per exit for SD models).
"""

from __future__ import annotations

import logging
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from ehgr_tpu.configs import Config
from ehgr_tpu.data.factory import build_test_dataset
from ehgr_tpu.data.pipeline import Loader
from ehgr_tpu.eval.metrics import ConfusionMatrix, topk_correct
from ehgr_tpu.models.tsn import variant
from ehgr_tpu.ops.preprocess_device import normalize_clip
from ehgr_tpu.train.checkpoints import load_for_model


def _build_model(cfg: Config, arch: str, calib_batches=None):
    model = variant(arch, num_class=cfg.model.num_classes,
                    num_segments=cfg.model.num_segments,
                    base_model=cfg.model.base_model,
                    temporal=(cfg.model.temporal_module
                              if cfg.model.is_shift else "none"),
                    shift_div=cfg.model.shift_div,
                    dropout=cfg.model.dropout,
                    partial_bn=cfg.model.partial_bn,
                    action_fused=(cfg.model.action_fused or None),
                    quantize=getattr(cfg.model, "quantize", False),
                    action_stages=tuple(getattr(cfg.model, "action_stages",
                                                (1, 2, 3, 4))),
                    dtype=jnp.dtype(cfg.model.dtype))
    x0 = jnp.zeros((1, cfg.model.num_segments, cfg.data.crop_size,
                    cfg.data.crop_size, 3), jnp.float32)
    init_fn = jax.jit(lambda r, x: model.init(r, x, train=False))
    variables = init_fn({"params": jax.random.key(0)}, x0)
    if cfg.run.checkpoint_path:
        variables = load_for_model(cfg.run.checkpoint_path, variables)
    if getattr(cfg.model, "quantize", False) == "static":
        # static int8 needs per-site activation scales.  Calibrate on REAL
        # eval clips when the caller provides them (run_test feeds the first
        # batches of the actual test loader — deep-layer activation ranges
        # under real data differ from noise, ADVICE r2 #1); random
        # protocol-shaped batches are only the no-dataset fallback.
        import dataclasses as _dc

        import numpy as _np

        from ehgr_tpu.ops.quantize import calibrate

        if calib_batches:
            xs = [normalize_clip(jnp.asarray(b), cfg.data.mean, cfg.data.std,
                                 dtype=jnp.float32) for b in calib_batches]
        else:
            logging.getLogger(__name__).warning(
                "int8 static: no calibration clips provided — scales are "
                "noise-calibrated; accuracy may degrade")
            rng = _np.random.default_rng(cfg.run.seed)
            xs = [jnp.asarray(rng.standard_normal(
                (8, cfg.model.num_segments, cfg.data.crop_size,
                 cfg.data.crop_size, 3)), jnp.float32)]
        cmodel = _dc.replace(model, quantize="calib")
        variables = calibrate(cmodel, variables, xs)
    return model, variables


def run_test(cfg: Config, arch: str = "tsn",
             heads: int = 1) -> Dict[str, float]:
    """Evaluate ``arch`` with the multi-clip protocol.  ``heads=4`` scores
    the SD model's final + three exits (``test_sd.py`` behavior)."""
    log = logging.getLogger(__name__)
    dataset = build_test_dataset(cfg)

    calib_batches = None
    if getattr(cfg.model, "quantize", False) == "static":
        # first 2 loader batches, clip-flattened to [N, T, H, W, C] uint8 —
        # the same pixels the protocol will score (calibration from the real
        # eval distribution)
        calib_loader = Loader(dataset,
                              batch_size=max(1, 8 // cfg.data.clip_num or 1),
                              shuffle=False, num_workers=0, drop_last=False)
        calib_batches = []
        t = cfg.model.num_segments
        for i, b in enumerate(calib_loader):
            rgb = np.asarray(b["rgb"])              # [V, K, crops*T, H, W, C]
            calib_batches.append(
                rgb.reshape((-1, t) + rgb.shape[3:]))
            if i >= 1:
                break

    model, variables = _build_model(cfg, arch, calib_batches=calib_batches)
    loader = Loader(dataset, batch_size=max(1, 8 // cfg.data.clip_num or 1),
                    shuffle=False, num_workers=cfg.data.num_workers,
                    drop_last=False)

    mean, std = cfg.data.mean, cfg.data.std

    @jax.jit
    def score(frames_u8):
        # [V, K, crops*T, H, W, C]; crop transforms emit frames crop-major
        # (GroupFullResSample/GroupOverSample append whole frame groups per
        # offset), so crops*T factors as (crops, T).  Crops fold into the
        # clip-vote axis — the reference's Stack + view-by-num_segments
        # equivalence (test.py:209-221 + models.py:323-356): probabilities
        # average over clips x crops.
        v, k, ct = frames_u8.shape[:3]
        t = cfg.model.num_segments
        crops = ct // t
        assert crops * t == ct, (ct, t)
        x = normalize_clip(frames_u8, mean, std,
                           dtype=jnp.dtype(cfg.model.dtype))
        x = x.reshape((v * k * crops, t) + x.shape[3:])
        out = model.apply(variables, x, train=False)
        outs = out if isinstance(out, tuple) else (out,)
        probs = []
        for lg in outs[:heads]:
            p = jax.nn.softmax(lg, axis=-1)
            probs.append(jnp.mean(p.reshape(v, k * crops, -1), axis=1))
        return tuple(probs)

    names = ["final"] + [f"mid{i}" for i in range(1, heads)]
    cms = {n: ConfusionMatrix(cfg.model.num_classes) for n in names}
    correct = {n: {1: 0, 5: 0} for n in names}
    total = 0
    for batch in loader:
        probs = score(jnp.asarray(batch["rgb"]))
        labels = jnp.asarray(batch["label"])
        total += int(labels.shape[0])
        for n, p in zip(names, probs):
            c1, c5 = topk_correct(p, labels, (1, 5))
            correct[n][1] += int(c1)
            correct[n][5] += int(c5)
            cms[n].update(np.asarray(jnp.argmax(p, axis=-1)),
                          np.asarray(batch["label"]))

    results: Dict[str, float] = {"n_videos": total}
    for n in names:
        results[f"{n}_top1"] = 100.0 * correct[n][1] / max(total, 1)
        results[f"{n}_top5"] = 100.0 * correct[n][5] / max(total, 1)
    log.info("test results: %s", results)
    results["confusion"] = cms  # type: ignore[assignment]
    return results
