"""SGD with the reference's 9-group lr/decay policy + step-decay schedule.

References:
* group walk & multipliers — ``models/models_MTMM.py:180-266``
  (first conv x1, conv biases x2/no-decay, BN no-decay, ACTION ("custom")
  weights x1, classifier head x5 weight / x10 bias when ``fc_lr5``,
  frozen BNs excluded under partial-BN),
* torch-SGD semantics — ``optimizer = optim.SGD(policies, momentum=0.9)``
  (``train_mtmm.py:578-585``): ``buf = mu*buf + (g + wd*p)``,
  ``p -= lr_group * buf``,
* step decay — ``utils.py:39-46``:
  ``lr = base_lr * 0.1^(#lr_steps passed) * lr_mult`` per epoch.

Implemented as one optax-style GradientTransformation over a label tree
derived from flax param paths — the JAX equivalent of the reference's
module-isinstance walk.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.traverse_util import flatten_dict, unflatten_dict

# label -> (lr_mult, decay_mult)   (models_MTMM.py:246-266)
GROUPS: Dict[str, Tuple[float, float]] = {
    "first_conv_weight": (1.0, 1.0),
    "first_conv_bias": (2.0, 0.0),
    "normal_weight": (1.0, 1.0),
    "normal_bias": (2.0, 0.0),
    "bn": (1.0, 0.0),
    "custom_weight": (1.0, 1.0),
    "custom_bn": (1.0, 0.0),
    "lr5_weight": (5.0, 1.0),
    "lr10_bias": (10.0, 0.0),
    "frozen": (0.0, 0.0),
}

_ACTION_CHILDREN = ("p1_conv", "p2_squeeze", "p2_conv1", "p2_expand",
                    "p3_squeeze", "p3_conv1", "p3_expand")
_HEAD_NAMES = ("new_fc", "middle_fc1", "middle_fc2", "middle_fc3")


def label_params(params, fc_lr5: bool = True,
                 partial_bn: bool = False):
    """Map each param leaf to a policy group, replicating the reference's
    ``get_optim_policies`` walk on our flax tree."""
    flat = flatten_dict(params)
    labels = {}
    for path, leaf in flat.items():
        parts = tuple(path)
        leafname = parts[-1]
        mods = parts[:-1]
        is_stem_bn = mods == ("base_model", "bn1")
        in_backbone = parts[0] == "base_model"
        is_bn_mod = mods and ("bn" in mods[-1])

        if leafname == "shift_w" or (
                mods and mods[-1] in _ACTION_CHILDREN and mods[-1] != "p3_bn1"):
            labels[path] = "custom_weight"
        elif mods and mods[-1] == "p3_bn1":
            labels[path] = "frozen" if partial_bn else "custom_bn"
        elif is_bn_mod:
            if partial_bn and not is_stem_bn:
                labels[path] = "frozen"
            else:
                labels[path] = "bn"
        elif mods == ("base_model", "conv1"):
            labels[path] = ("first_conv_weight" if leafname == "kernel"
                            else "first_conv_bias")
        elif mods and mods[-1] in _HEAD_NAMES:
            if fc_lr5:
                labels[path] = ("lr5_weight" if leafname == "kernel"
                                else "lr10_bias")
            else:
                labels[path] = ("normal_weight" if leafname == "kernel"
                                else "normal_bias")
        elif leafname == "kernel":
            labels[path] = "normal_weight"
        else:
            labels[path] = "normal_bias"
    return unflatten_dict(labels)


class SgdPoliciesState(NamedTuple):
    step: jnp.ndarray           # global step counter
    momentum: Any               # momentum buffer tree
    hyper: Any = None           # schedule scalars (see sgd_policies)


# lr_steps is carried as a fixed-width padded array so the compiled program
# is independent of how many decay boundaries a run uses
_MAX_LR_STEPS = 8
_LR_STEP_PAD = 2 ** 30          # an epoch no run ever reaches


def step_decay_factor(epoch: jnp.ndarray, lr_steps: Sequence[int],
                      gamma: float = 0.1) -> jnp.ndarray:
    """``gamma ** (#lr_steps passed)`` (utils.py:39-46)."""
    steps = jnp.asarray(lr_steps)
    return gamma ** jnp.sum(epoch >= steps)


def sgd_policies(labels, base_lr: float, momentum: float = 0.9,
                 weight_decay: float = 1e-5,
                 lr_steps: Sequence[int] = (10, 15, 20), gamma: float = 0.1,
                 steps_per_epoch: int = 1) -> optax.GradientTransformation:
    """Build the policy optimizer.  ``labels`` from ``label_params``;
    the epoch for the decay schedule is derived from the step counter.

    TPU-first detail: every schedule hyperparameter (base lr, decay
    boundaries, gamma, steps/epoch, momentum, weight decay) lives in the
    OPTIMIZER STATE as scalar arrays, not in the traced program.  Baked-in
    constants made every lr/epoch tweak a distinct XLA program — a full
    train-step recompile (~10 min through the TPU tunnel) per hyperparameter
    change; as state leaves, one compiled executable serves all schedules
    and the persistent jit cache hits across runs.  The math is bit-exact
    with the constant version: the per-GROUP lr (base_lr x multiplier) is
    rounded to f32 on the host exactly where the old trace baked it, and
    the group multipliers/decay masks stay compile-time literals."""
    assert len(lr_steps) <= _MAX_LR_STEPS, lr_steps
    # per-leaf STRUCTURE stays literal (it is architecture, not schedule):
    # decay masks are exact {0,1} and group lrs index the hyper dict
    decays = jax.tree.map(lambda lab: GROUPS[lab][1], labels)

    import numpy as np
    padded = tuple(lr_steps) + (_LR_STEP_PAD,) * (_MAX_LR_STEPS
                                                  - len(lr_steps))
    hyper0 = {
        # f32(base_lr * mult) on host == the f32 literal the old trace used
        "group_lr": {g: jnp.asarray(np.float32(base_lr * m), jnp.float32)
                     for g, (m, _) in GROUPS.items()},
        "momentum": jnp.asarray(np.float32(momentum), jnp.float32),
        "weight_decay": jnp.asarray(np.float32(weight_decay), jnp.float32),
        "gamma": jnp.asarray(np.float32(gamma), jnp.float32),
        "lr_steps": jnp.asarray(padded, jnp.int32),
        "steps_per_epoch": jnp.asarray(steps_per_epoch, jnp.int32),
    }

    def init(params):
        return SgdPoliciesState(
            step=jnp.zeros((), jnp.int32),
            momentum=jax.tree.map(jnp.zeros_like, params),
            hyper=hyper0)

    def update(grads, state, params=None):
        assert params is not None
        hp = state.hyper
        epoch = state.step // hp["steps_per_epoch"]
        # The reference calls ``adjust_learning_rate(…, epoch, lr_steps)`` at
        # the END of each epoch (train_mtmm.py:612-613), so the decay computed
        # from epoch e first applies during epoch e+1: with lr_steps=[10,…]
        # epoch 10 still trains at full lr and epoch 11 is the first decayed
        # one (verified against runs/EgoGesture/MTMM/…/train.log epochs
        # 10→11: 0.00125→0.00013).  Hence the factor for the CURRENT epoch
        # is the utils.py:39-46 formula evaluated at epoch-1.
        factor = hp["gamma"] ** jnp.sum((epoch - 1) >= hp["lr_steps"])

        wd = hp["weight_decay"]
        new_buf = jax.tree.map(
            lambda g, p, buf, dm: hp["momentum"] * buf + g + wd * dm * p,
            grads, params, state.momentum, decays)
        updates = jax.tree.map(
            lambda buf, lab: -(hp["group_lr"][lab] * factor) * buf,
            new_buf, labels)
        return updates, SgdPoliciesState(step=state.step + 1,
                                         momentum=new_buf, hyper=hp)

    return optax.GradientTransformation(init, update)


def adopt_config_hyper(restored, fresh, log=None):
    """Graft the FRESH (current-config) schedule hyperparameters into a
    restored optimizer state (possibly an ``optax.chain`` tuple).

    Schedule scalars live in ``SgdPoliciesState.hyper`` so one compiled
    step serves all schedules — but that means a full-state resume would
    otherwise silently keep the CHECKPOINTED lr/lr_steps/gamma/momentum/wd
    and ignore any config change (ADVICE r4).  Resume semantics are
    therefore: momentum buffers + step counter come from the checkpoint,
    the schedule comes from the current config.  Checkpoints written
    before ``hyper`` existed do not restore (pytree structure mismatch) —
    re-train or restore weights-only via ``checkpoint_path`` without
    ``resume_full``."""
    if isinstance(restored, SgdPoliciesState):
        if log is not None:
            ck, fr = restored.hyper, fresh.hyper
            diffs = [k for k in ("momentum", "weight_decay", "gamma",
                                 "lr_steps", "steps_per_epoch")
                     if not jnp.array_equal(ck[k], fr[k])]
            diffs += [f"lr[{g}]" for g in fr["group_lr"]
                      if not jnp.array_equal(ck["group_lr"][g],
                                             fr["group_lr"][g])]
            if diffs:
                log.warning(
                    "resume: checkpointed schedule differs from config on "
                    "%s; using the CURRENT config's schedule", diffs)
        return restored._replace(hyper=fresh.hyper)
    if isinstance(restored, tuple):
        items = tuple(adopt_config_hyper(r, f, log)
                      for r, f in zip(restored, fresh))
        # optax chain states are plain tuples; sub-states are namedtuples
        return (type(restored)(*items) if hasattr(restored, "_fields")
                else items)
    return restored


def build_optimizer(params, cfg_optim, fc_lr5: bool = True,
                    partial_bn: bool = False, steps_per_epoch: int = 1):
    """Config -> (optimizer, labels).  ``policies=False`` = single param
    group (plain SGD+momentum+wd, train_slowonly.py style)."""
    if getattr(cfg_optim, "policies", True):
        labels = label_params(params, fc_lr5=fc_lr5, partial_bn=partial_bn)
    else:
        labels = jax.tree.map(lambda _: "normal_weight", params)
    tx = sgd_policies(
        labels, base_lr=cfg_optim.lr, momentum=cfg_optim.momentum,
        weight_decay=cfg_optim.weight_decay, lr_steps=cfg_optim.lr_steps,
        gamma=cfg_optim.gamma, steps_per_epoch=steps_per_epoch)
    if cfg_optim.clip_gradient:
        tx = optax.chain(optax.clip_by_global_norm(cfg_optim.clip_gradient),
                         tx)
    return tx, labels
