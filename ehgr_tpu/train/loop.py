"""Shared training loop — the L5 skeleton every trainer verb reuses.

Replicates the reference trainer behaviors (``train_mtmm.py:385-617``):
per-run directory ``runs/<dataset>/<stage>/<timestamp>_<name>/`` with
``train.log``, per-epoch validation of both the live model and its EMA,
``latest``/``best``/``ema_best`` checkpointing keyed on val top-1, step-decay
LR (inside the optimizer), display-interval metering with data/batch times,
and the non-strict stage-transfer load (MTMM -> SD).

The reference duplicates this loop 5x (SURVEY.md §2.3) — here it exists once.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ehgr_tpu.configs import Config
from ehgr_tpu.train.checkpoints import CheckpointManager, load_for_model
from ehgr_tpu.train.optim import build_optimizer
from ehgr_tpu.train.steps import (create_train_state, make_eval_step,
                                  make_train_step)
from ehgr_tpu.utils.meters import AverageMeter, StepTimer


def fetch_scalar(x, retries: int = 2) -> float:
    """``float(x)`` with bounded retries: the TPU tunnel occasionally throws
    a transient FAILED_PRECONDITION on device->host reads (CLAUDE.md); a
    re-read succeeds when it was an RPC blip rather than a backend restart.
    A round-4 learnable probe died exactly here mid-epoch on one blip."""
    for attempt in range(retries + 1):
        try:
            return float(x)
        except jax.errors.JaxRuntimeError:
            if attempt == retries:
                raise
            logging.getLogger(__name__).warning(
                "transient device read failure; retrying (%d left)",
                retries - attempt)
            time.sleep(2.0)


def setup_run_dir(cfg: Config, stage: str) -> str:
    ts = time.strftime("%Y-%m-%d-%H-%M-%S")
    run_dir = os.path.join(cfg.run.run_dir, cfg.data.dataset, stage.upper(),
                           f"{ts}_{cfg.run.model_name}")
    os.makedirs(run_dir, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(message)s",
        handlers=[logging.FileHandler(os.path.join(run_dir, "train.log")),
                  logging.StreamHandler()],
        force=True)
    return run_dir


def select_batch(batch: Dict[str, np.ndarray], stage: str,
                 modal: str) -> Dict[str, jnp.ndarray]:
    """Map dataset fields onto the train-step contract.

    Stage 1 (MTMM) supervises the NEXT segment's depth: ``n_depth`` for
    ``rgb_depth``, ``n_depth_est`` (MiDaS pseudo-depth) for ``rgb_depthest``
    (``train_mtmm.py:223-231``); the joint stage uses the CURRENT clip's
    depth (``train_mtmm_sd.py``)."""
    out = {"rgb": batch["rgb"], "label": batch["label"]}
    if stage == "mtmm":
        key = "n_depth_est" if modal == "rgb_depthest" else "n_depth"
        out["depth"] = batch[key]
    elif stage == "mtmm_sd":
        key = "depth_est" if modal == "rgb_depthest" else "depth"
        out["depth"] = batch[key]
    return {k: jnp.asarray(v) for k, v in out.items()}


def save_depth_artifacts(model, state, batch, run_dir: str, step: int,
                         mean, std, depth_size: int):
    """Dump predicted vs GT depth JPEG grids during MTMM training
    (ref ``train_mtmm.py:267-271`` via torchshow)."""
    from PIL import Image

    from ehgr_tpu.ops.preprocess_device import depth_to_target, normalize_clip

    rgb = normalize_clip(batch["rgb"][:1], mean, std)
    out = model.apply({"params": state.params,
                       "batch_stats": state.batch_stats}, rgb, train=False)
    depth_pred = out[-1] if isinstance(out, tuple) else out
    depth_pred = np.asarray(depth_pred.reshape((-1,) + depth_pred.shape[-3:]))
    gt = depth_to_target(jnp.asarray(batch["depth"][:1]), depth_size)
    gt = np.asarray(gt.reshape((-1,) + gt.shape[-3:]))

    def grid(x):  # [T, h, w, 1] -> horizontal strip
        strip = np.concatenate(list(x[..., 0]), axis=1)
        return Image.fromarray((np.clip(strip, 0, 1) * 255).astype(np.uint8))

    grid(depth_pred).save(os.path.join(run_dir, f"g_depth_out_{step}.jpg"))
    grid(gt).save(os.path.join(run_dir, f"g_depth_gt_{step}.jpg"))


def validate(eval_step, state, loader, stage: str) -> Dict[str, float]:
    totals: Dict[str, float] = {}
    n = 0
    for batch in loader:
        res = eval_step(state, {"rgb": jnp.asarray(batch["rgb"]),
                                "label": jnp.asarray(batch["label"])})
        # one bulk device->host read per batch, not one per metric: each
        # fetch pays the ~30 ms tunnel round-trip (CLAUDE.md)
        for attempt in (0, 1):
            try:
                res = {k: float(v) for k, v in jax.device_get(res).items()}
                break
            except jax.errors.JaxRuntimeError:
                if attempt:
                    raise
                time.sleep(2.0)
        n += int(res.pop("n"))
        for k, v in res.items():
            totals[k] = totals.get(k, 0.0) + v
    return {k: 100.0 * v / max(n, 1) for k, v in totals.items()} | {"n": n}


def run_training(cfg: Config, stage: str, train_dataset, val_dataset,
                 max_steps_per_epoch: Optional[int] = None,
                 epochs: Optional[int] = None) -> Dict[str, float]:
    """Train ``stage`` on the given datasets; returns final metrics."""
    from ehgr_tpu.data.pipeline import Loader

    run_dir = setup_run_dir(cfg, stage)
    log = logging.getLogger(__name__)
    log.info("config: %s", cfg)

    train_loader = Loader(train_dataset, cfg.data.batch_size, shuffle=True,
                          seed=cfg.run.seed, num_workers=cfg.data.num_workers)
    val_loader = Loader(val_dataset, cfg.data.batch_size, shuffle=False,
                        num_workers=cfg.data.num_workers, drop_last=False)
    steps_per_epoch = min(len(train_loader),
                          max_steps_per_epoch or len(train_loader))

    from ehgr_tpu.models.factory import build_model
    model = build_model(cfg.model)
    x0 = jnp.zeros((2, cfg.model.num_segments, cfg.data.train_crop,
                    cfg.data.train_crop, 3), jnp.float32)
    init_fn = jax.jit(lambda r, x: model.init(r, x, train=False))
    variables = init_fn({"params": jax.random.key(cfg.run.seed)}, x0)

    if cfg.run.checkpoint_path and not cfg.run.resume_full:
        log.info("loading checkpoint %s (non-strict)", cfg.run.checkpoint_path)
        variables = load_for_model(cfg.run.checkpoint_path, variables)

    tx, _ = build_optimizer(variables["params"], cfg.optim,
                            fc_lr5=cfg.model.fc_lr5,
                            partial_bn=cfg.model.partial_bn,
                            steps_per_epoch=steps_per_epoch)
    state = create_train_state(variables, tx)

    start_epoch = 0
    if cfg.run.checkpoint_path and cfg.run.resume_full:
        # crash-resume: optimizer momentum, EMA trees, and step counter come
        # back exactly (the step counter also restores the LR-decay epoch)
        import orbax.checkpoint as ocp

        from ehgr_tpu.train.optim import adopt_config_hyper

        fresh_opt = state.opt_state
        with ocp.StandardCheckpointer() as ckptr:
            state = ckptr.restore(cfg.run.checkpoint_path,
                                  jax.device_get(state))
        # schedule scalars ride the opt state (optim.py); a resume takes
        # the CURRENT config's schedule, not the checkpointed one
        state = state.replace(opt_state=adopt_config_hyper(
            state.opt_state, fresh_opt, log))
        start_epoch = int(state.step) // max(steps_per_epoch, 1)
        log.info("resumed full train state from %s at step %d (epoch %d)",
                 cfg.run.checkpoint_path, int(state.step), start_epoch)

    # the global decoder emits TRAIN-crop/4 (224 -> 56, the size the
    # reference hardcodes, train_mtmm.py:226-229); the test crop can differ
    # (NvGesture tests at 256) without changing the depth-target geometry
    from dataclasses import replace as _replace
    loss_cfg = _replace(cfg.loss, depth_size=cfg.data.train_crop // 4)
    step_fn = make_train_step(model, tx, stage=stage, loss_cfg=loss_cfg,
                              ema_decay=cfg.optim.ema_decay,
                              mean=cfg.data.mean, std=cfg.data.std,
                              accum_steps=cfg.optim.accum_steps)
    multi = stage in ("sd", "mtmm_sd")
    eval_fn = make_eval_step(model, mean=cfg.data.mean, std=cfg.data.std,
                             multi_output=multi)
    eval_ema_fn = make_eval_step(model, mean=cfg.data.mean, std=cfg.data.std,
                                 use_ema=True, multi_output=multi)

    from ehgr_tpu.utils.metrics_log import MetricsLogger
    metrics_log = MetricsLogger(run_dir, name=cfg.run.model_name)
    ckpt = CheckpointManager(run_dir, cfg.run.model_name)
    rng = jax.random.key(cfg.run.seed + 1)
    best, ema_best = -1.0, -1.0
    last_val: Dict[str, float] = {}

    n_epochs = epochs or cfg.optim.epochs
    for epoch in range(start_epoch, n_epochs):
        timer = StepTimer()
        loss_m, top1_m = AverageMeter(), AverageMeter()
        for i, batch in enumerate(train_loader):
            if i >= steps_per_epoch:
                break
            timer.data_ready()
            b = select_batch(batch, stage, cfg.model.modal)
            state, metrics = step_fn(state, b, rng)
            n = int(b["label"].shape[0])
            loss_m.update(fetch_scalar(metrics["loss"]), n)
            top1_m.update(fetch_scalar(metrics["top1"]), n)
            timer.step_done()
            if (i + 1) % cfg.run.display == 0:
                log.info(
                    "Epoch [%d][%d/%d] data %.3f (%.3f) batch %.3f (%.3f) "
                    "loss %.4f (%.4f) top1 %.2f (%.2f)",
                    epoch, i + 1, steps_per_epoch,
                    timer.data_time.val, timer.data_time.avg,
                    timer.batch_time.val, timer.batch_time.avg,
                    loss_m.val, loss_m.avg, top1_m.val, top1_m.avg)
                if cfg.run.save_depth_images and "depth" in b:
                    save_depth_artifacts(
                        model, state, b, run_dir, int(state.step),
                        cfg.data.mean, cfg.data.std, loss_cfg.depth_size)

        light = cfg.run.ckpt_light
        if not light:
            ckpt.save("latest", jax.device_get(state))
        val = validate(eval_fn, state, val_loader, stage)
        val_ema = validate(eval_ema_fn, state, val_loader, stage)
        log.info("Epoch %d val: %s | ema: %s", epoch, val, val_ema)
        metrics_log.log(
            {"epoch": epoch, "train_loss": loss_m.avg,
             "train_top1": top1_m.avg,
             **{f"val_{k}": v for k, v in val.items()},
             **{f"ema_{k}": v for k, v in val_ema.items()}}, step=epoch)
        if val.get("final_top1", 0.0) > best:
            best = val["final_top1"]
            if light:
                best_host = jax.device_get(state)
            else:
                ckpt.save("best", jax.device_get(state))
        if val_ema.get("final_top1", 0.0) > ema_best:
            ema_best = val_ema["final_top1"]
            if light:
                ema_best_host = jax.device_get(state)
            else:
                ckpt.save("ema_best", jax.device_get(state))
        last_val = val

    if cfg.run.ckpt_light and n_epochs > start_epoch:
        # deferred writes: identical end-of-training artifacts, one sync
        ckpt.save("latest", jax.device_get(state))
        if best >= 0.0:
            ckpt.save("best", best_host)
        if ema_best >= 0.0:
            ckpt.save("ema_best", ema_best_host)
    metrics_log.close()
    return {"best_top1": best, "ema_best_top1": ema_best,
            "final_train_loss": loss_m.avg, **last_val,
            "run_dir": run_dir}
