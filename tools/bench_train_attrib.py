"""Attribute the MTMM train step's time (VERDICT r2 weak #1 / next #2).

Round 2 measured the inference side exhaustively but left the training
step's ~4.5% MFU unattributed.  This tool decomposes the step on the real
chip, pipelined-dispatch timed with scalar-fetch barriers (CLAUDE.md:
``block_until_ready`` can return early through the tunnel):

  A. forward-only          (train-mode forward, loss, no grad)
  B. fwd+bwd               (value_and_grad, no optimizer/EMA)
  C. full step             (fwd+bwd + policy-SGD + EMA blend)
  D. optimizer+EMA alone   (fixed grad tree)
and per-config rows: temporal none/tsm/action, tsn vs tsn_mtmm (decoder
cost), batch sweep 16/32/48, remat on/off.

Usage: python tools/bench_train_attrib.py [--quick]
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import torch  # noqa: F401  (torch before jax; CLAUDE.md)
import jax
import jax.numpy as jnp

# persistent jit cache: repeat tool invocations skip the ~5 min remote
# compiles (tunnel compile service)
jax.config.update("jax_compilation_cache_dir", "/tmp/ehgr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import optax

from ehgr_tpu.train.ema import ema_update

from ehgr_tpu.configs import LossConfig, OptimConfig
from ehgr_tpu.models.tsn import variant
from ehgr_tpu.ops.preprocess_device import depth_to_target, normalize_clip
from ehgr_tpu.train import losses
from ehgr_tpu.train.optim import build_optimizer
from ehgr_tpu.train.steps import create_train_state, make_train_step

T, HW, CLS = 8, 224, 83
MEAN, STD = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)


def _build(arch: str, temporal: str, remat: bool = False):
    model = variant(arch, num_class=CLS, num_segments=T,
                    base_model="resnet50", temporal=temporal,
                    partial_bn=False, remat=remat, dtype=jnp.bfloat16)
    x0 = jnp.zeros((2, T, HW, HW, 3), jnp.float32)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        {"params": jax.random.key(0)}, x0)
    return model, variables


def _batch(batch, with_depth):
    rng = np.random.default_rng(2)
    b = {"rgb": jnp.asarray(
        rng.integers(0, 256, (batch, T, HW, HW, 3)), jnp.uint8),
        "label": jnp.asarray(rng.integers(0, CLS, (batch,)))}
    if with_depth:
        b["depth"] = jnp.asarray(
            rng.integers(0, 256, (batch, T, HW, HW, 1)), jnp.uint8)
    return b


def _time(fn, *args, warmup=2, iters=6, thread_state=False):
    """Pipelined dispatch, one scalar barrier.  ``thread_state``: fn returns
    (state, scalar) and we re-feed state (donation-friendly)."""
    if thread_state:
        st = args[0]
        for _ in range(warmup):
            st, s = fn(st, *args[1:])
        float(s)
        t0 = time.perf_counter()
        st2 = st
        for _ in range(iters):
            st2, s = fn(st2, *args[1:])
        float(s)
        return (time.perf_counter() - t0) / iters * 1e3
    for _ in range(warmup):
        s = fn(*args)
    float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(*args)
    float(s)
    return (time.perf_counter() - t0) / iters * 1e3


def _loss_fn(model, stage, loss_cfg):
    def loss(params, batch_stats, batch, rng):
        rgb = normalize_clip(batch["rgb"], MEAN, STD, dtype=jnp.float32)
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, rgb, train=True,
            mutable=["batch_stats"], rngs={"dropout": rng})
        if stage == "mtmm":
            logits, depth_pred = out
            depth_pred = depth_pred.reshape((-1,) + depth_pred.shape[-3:])
            depth_gt = depth_to_target(batch["depth"], loss_cfg.depth_size)
            depth_gt = depth_gt.reshape((-1,) + depth_gt.shape[2:])
            total, _ = losses.mtmm_total(logits, batch["label"], depth_pred,
                                         depth_gt)
        else:
            total = losses.cross_entropy(out, batch["label"])
        return total, mut["batch_stats"]
    return loss


def attrib_row(name, arch, temporal, batch, remat=False, iters=6):
    stage = "mtmm" if arch == "tsn_mtmm" else "baseline"
    model, variables = _build(arch, temporal, remat)
    tx, _ = build_optimizer(variables["params"], OptimConfig(),
                            steps_per_epoch=100)
    state = create_train_state(variables, tx)
    b = _batch(batch, with_depth=(stage == "mtmm"))
    loss_cfg = LossConfig(depth_size=HW // 4)
    key = jax.random.key(0)

    loss = _loss_fn(model, stage, loss_cfg)

    def _grad_alive(v, g):
        # fold every grad leaf into the returned scalar — returning only the
        # value lets XLA dead-code-eliminate the whole backward (measured:
        # "fwd+bwd" == fwd to 0.1 ms before this guard)
        return v + 1e-30 * jax.tree_util.tree_reduce(
            lambda a, l: a + jnp.sum(l.astype(jnp.float32)), g, 0.0)

    fwd = jax.jit(lambda p, bs, bt: loss(p, bs, bt, key)[0])
    fwdbwd = jax.jit(lambda p, bs, bt: _grad_alive(*jax.value_and_grad(
        lambda pp: loss(pp, bs, bt, key)[0])(p)))
    step = make_train_step(model, tx, stage=stage, loss_cfg=loss_cfg,
                           ema_decay=0.9999, mean=MEAN, std=STD,
                           donate=False)

    # D. optimizer + EMA alone over a fixed grad tree (params as stand-in
    # grads — same shapes/dtypes), kept alive via a scalar probe
    opt_ema = jax.jit(lambda st, g: (lambda up, os: (lambda p: jnp.sum(
        jax.tree_util.tree_reduce(
            lambda a, l: a + jnp.sum(l.astype(jnp.float32)), p, 0.0)
        + jax.tree_util.tree_reduce(
            lambda a, l: a + jnp.sum(l.astype(jnp.float32)),
            ema_update(st.ema_params, p, 0.9999), 0.0)))(
        optax.apply_updates(st.params, up)))(
        *tx.update(g, st.opt_state, st.params)))

    t_fwd = _time(fwd, state.params, state.batch_stats, b, iters=iters)
    t_fb = _time(fwdbwd, state.params, state.batch_stats, b, iters=iters)
    t_oe = _time(opt_ema, state, state.params, iters=iters)
    t_full = _time(lambda st, bt: (lambda s, m: (s, m["loss"]))(
        *step(st, bt, key)), state, b, thread_state=True, iters=iters)

    cps = batch / (t_full / 1e3)
    print(f"{name:34s} b={batch:3d} fwd={t_fwd:7.1f}ms "
          f"fwd+bwd={t_fb:7.1f}ms opt+ema={t_oe:6.1f}ms "
          f"full={t_full:7.1f}ms  {cps:6.1f} clips/s", flush=True)
    return dict(name=name, batch=batch, fwd_ms=t_fwd, fwdbwd_ms=t_fb,
                opt_ema_ms=t_oe, full_ms=t_full, clips_per_sec=cps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--rows", type=str, default="")
    args = ap.parse_args()

    all_rows = [
        ("mtmm action b32 (bench cfg)", "tsn_mtmm", "action", 32, False),
        ("mtmm action b16", "tsn_mtmm", "action", 16, False),
        ("mtmm action b48", "tsn_mtmm", "action", 48, False),
        ("baseline action b32 (no dec)", "tsn", "action", 32, False),
        ("baseline tsm b32", "tsn", "tsm", 32, False),
        ("baseline none b32", "tsn", "none", 32, False),
        ("mtmm action b64 remat", "tsn_mtmm", "action", 64, True),
    ]
    if args.rows:
        keep = args.rows.split(",")
        all_rows = [r for r in all_rows if any(k in r[0] for k in keep)]
    if args.quick:
        all_rows = all_rows[:1]
    out = []
    for name, arch, temporal, batch, remat in all_rows:
        out.append(attrib_row(name, arch, temporal, batch, remat))
    return out


if __name__ == "__main__":
    main()
