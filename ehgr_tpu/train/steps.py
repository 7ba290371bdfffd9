"""Jitted train/eval steps for the three training stages.

One step = on-device preprocessing + forward + loss + backward + SGD update
+ EMA blend, all fused under a single ``jit`` (the reference spreads this
over the dataloader, ``model(rgb)``, ``loss.backward()``, ``optimizer.step()``
and a Python EMA loop — ``train_mtmm.py:194-279``).

Batches are uint8 host tensors (``rgb [N,T,224,224,3]``, optional depth
``[N,T,224,224,1]``, ``label [N]``): normalization and depth-target resizing
happen on device where XLA fuses them into the first conv / loss.

Data parallelism: state is replicated, batches are sharded on the ``data``
mesh axis; GSPMD inserts the gradient all-reduce (and makes BN batch stats
global means — free sync-BN).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ehgr_tpu.ops.preprocess_device import depth_to_target, normalize_clip
from ehgr_tpu.train import losses
from ehgr_tpu.train.ema import ema_update
from ehgr_tpu.eval.metrics import topk_correct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    ema_batch_stats: Any


def create_train_state(variables, tx) -> TrainState:
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=stats,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params),
        ema_batch_stats=jax.tree.map(jnp.copy, stats),
    )


def _forward(model, params, batch_stats, rgb, train, rng):
    variables = {"params": params, "batch_stats": batch_stats}
    rngs = {"dropout": rng} if train else {}
    if train:
        out, mut = model.apply(variables, rgb, train=True,
                               mutable=["batch_stats"], rngs=rngs)
        return out, mut["batch_stats"]
    return model.apply(variables, rgb, train=False), batch_stats


def make_train_step(model, tx, *, stage: str, loss_cfg, ema_decay: float,
                    mean, std, donate: bool = True,
                    accum_steps: int = 1) -> Callable:
    """Build the jitted step for ``stage`` in {'baseline','mtmm','sd',
    'mtmm_sd'}.  Returns ``(state, batch, rng) -> (state, metrics)``.

    ``accum_steps=A > 1`` enables gradient accumulation: the batch (leading
    dim N, divisible by A) is split into A microbatches and scanned, so only
    one microbatch's activations are ever live — effective batches beyond
    the single-pass HBM wall (b48 OOMs on 16 GB, docs/PERF.md) at the b16
    throughput peak.  Semantics match the standard ``loss / A`` torch
    convention: gradients are the mean over microbatches (exactly the
    full-batch gradient for mean-reduced losses; sum-reduced terms — the SD
    hint loss, train_sd.py:191-193 — scale by 1/A), BN batch stats see each
    microbatch sequentially, dropout draws a fresh key per microbatch, and
    the optimizer + EMA update once per call.
    """

    def loss_fn(params, batch_stats, batch, rng):
        rgb = normalize_clip(batch["rgb"], mean, std,
                             dtype=jnp.float32)
        out, new_stats = _forward(model, params, batch_stats, rgb, True, rng)
        labels = batch["label"]

        if stage == "baseline":
            logits = out
            total = losses.cross_entropy(logits, labels)
            aux = {"ce": total}
        elif stage == "mtmm":
            logits, depth_pred = out
            # 3D models (R2Plus1D-MTMM) emit [N, T, h, w, 1]; TSN emits
            # [NT, h, w, 1] — normalize to the latter
            depth_pred = depth_pred.reshape((-1,) + depth_pred.shape[-3:])
            depth_gt = depth_to_target(batch["depth"], loss_cfg.depth_size)
            depth_gt = depth_gt.reshape((-1,) + depth_gt.shape[2:])
            total, aux = losses.mtmm_total(
                logits, labels, depth_pred, depth_gt,
                depth_weight=loss_cfg.depth_weight)
        elif stage == "sd":
            logits, m1, m2, m3, ffea, f1, f2, f3 = out
            total, aux = losses.sd_total(
                logits, (m1, m2, m3), labels, ffea, (f1, f2, f3),
                alpha=loss_cfg.alpha, beta=loss_cfg.beta,
                temperature=loss_cfg.temperature)
        elif stage == "mtmm_sd":
            # modal 'rgb_depth' output order (models_MTMM_SD.py:519-521):
            # 8 SD outputs + local depth + GLOBAL depth; only the global
            # depth is supervised (train_mtmm_sd.py:252-259)
            logits, m1, m2, m3, ffea, f1, f2, f3 = out[:8]
            depth_pred = out[9]
            depth_gt = depth_to_target(batch["depth"], loss_cfg.depth_size)
            depth_gt = depth_gt.reshape((-1,) + depth_gt.shape[2:])
            total, aux = losses.mtmm_sd_total(
                logits, (m1, m2, m3), labels, ffea, (f1, f2, f3),
                depth_pred, depth_gt, alpha=loss_cfg.alpha,
                beta=loss_cfg.beta, temperature=loss_cfg.temperature,
                depth_weight=loss_cfg.depth_weight)
        else:
            raise ValueError(stage)
        return total, (new_stats, aux, logits)

    def _grads_and_metrics(state, batch, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if accum_steps == 1:
            (total, (new_stats, aux, logits)), grads = grad_fn(
                state.params, state.batch_stats, batch, rng)
            c1, c5 = topk_correct(logits, batch["label"], (1, 5))
            return grads, new_stats, total, aux, c1, c5

        n = batch["label"].shape[0]
        if n % accum_steps:
            raise ValueError(
                f"batch size {n} not divisible by accum_steps={accum_steps}")
        micro = jax.tree.map(
            lambda x: x.reshape((accum_steps, -1) + x.shape[1:]), batch)

        def micro_step(carry, xs):
            stats, gacc = carry
            mb, k = xs
            (total, (new_stats, aux, logits)), grads = grad_fn(
                state.params, stats, mb, jax.random.fold_in(rng, k))
            gacc = jax.tree.map(lambda a, g: a + g / accum_steps, gacc, grads)
            c1, c5 = topk_correct(logits, mb["label"], (1, 5))
            out = dict(aux)
            out.update(_loss=total, _c1=c1, _c5=c5)
            return (new_stats, gacc), out

        zeros = jax.tree.map(jnp.zeros_like, state.params)
        (new_stats, grads), outs = jax.lax.scan(
            micro_step, (state.batch_stats, zeros),
            (micro, jnp.arange(accum_steps)))
        total = jnp.mean(outs.pop("_loss"))
        c1, c5 = jnp.sum(outs.pop("_c1")), jnp.sum(outs.pop("_c5"))
        aux = {k: jnp.mean(v) for k, v in outs.items()}
        return grads, new_stats, total, aux, c1, c5

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array) -> Tuple[TrainState, Dict]:
        rng = jax.random.fold_in(rng, state.step)
        grads, new_stats, total, aux, c1, c5 = _grads_and_metrics(
            state, batch, rng)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
            ema_params=ema_update(state.ema_params, params, ema_decay),
            ema_batch_stats=ema_update(state.ema_batch_stats, new_stats,
                                       ema_decay),
        )
        n = batch["label"].shape[0]
        metrics = {"loss": total, "top1": 100.0 * c1 / n,
                   "top5": 100.0 * c5 / n}
        metrics.update({k: jnp.mean(v) for k, v in aux.items()})
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, *, mean, std, use_ema: bool = False,
                   multi_output: bool = False) -> Callable:
    """Validation step: logits + top1/top5 counts (ref ``validation()``)."""

    @jax.jit
    def eval_step(state: TrainState, batch):
        params = state.ema_params if use_ema else state.params
        stats = state.ema_batch_stats if use_ema else state.batch_stats
        rgb = normalize_clip(batch["rgb"], mean, std, dtype=jnp.float32)
        out = model.apply({"params": params, "batch_stats": stats},
                          rgb, train=False)
        outs = out if isinstance(out, tuple) else (out,)
        logits_set = outs[:4] if multi_output else outs[:1]
        res = {}
        for i, lg in enumerate(logits_set):
            c1, c5 = topk_correct(lg, batch["label"], (1, 5))
            key = "final" if i == 0 else f"mid{i}"
            res[f"{key}_top1"] = c1
            res[f"{key}_top5"] = c5
        res["n"] = jnp.asarray(batch["label"].shape[0])
        return res

    return eval_step
