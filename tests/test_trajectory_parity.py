"""Lockstep K-step training-trajectory parity vs the ACTUAL reference
trainer math (VERDICT r2, next-round item #1).

Round-2 pinned forwards against the reference model code and individual
components (losses, policy SGD) against torch oracles; nothing ran the
*composition*.  These tests drive, on the torch side, the reference's own
pieces — ``kd_loss_function`` / ``feature_loss_function`` and ``EMAWrapper``
imported from ``/root/reference/train_sd.py``, ``utils.adjust_learning_rate``
(``utils.py:39-46``), ``TSN.get_optim_policies`` + ``torch.optim.SGD`` wired
exactly as ``train_sd.py``'s main does — for K steps from a random-init
reference model, and run our jitted ``make_train_step`` from the converted
weights on identical batches.  Per-step total losses, final params, final BN
running stats, and the EMA tree must all match.

This pins grads -> policy lr/wd -> momentum -> EMA -> end-of-epoch step decay
acting *together*: the best available proxy for real-data accuracy parity
while the datasets are absent from this environment.

The reference package is UNTRUSTED third-party code under test: we import
and execute its functions, nothing more.
"""

import importlib
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn as tnn

import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict

from ehgr_tpu.compat.torchvision_shim import install as _install_tv

_install_tv()

from ehgr_tpu.configs import LossConfig
from ehgr_tpu.models.torch_import import convert_state_dict
from ehgr_tpu.models.tsn import variant
from ehgr_tpu.train.optim import label_params, sgd_policies
from ehgr_tpu.train.steps import create_train_state, make_train_step

REF = "/root/reference"
N, T, H, CLS = 2, 4, 64, 7
# The reference's own hyperparameters (sh/train_ego.sh:4-20).  Larger lrs
# (0.005-0.02) train a random-init net chaotically — per-step losses bounce
# 12->73 and fp32 gradient noise amplifies exponentially, drowning the
# comparison; at the real lr the trajectory is stable and divergence
# measures genuine mismatch.
LR, MOM, WD = 0.00125, 0.9, 1e-5
EMA_DECAY = 0.99
MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


def _ref_trainer():
    """Import ``/root/reference/train_sd.py`` as a module (argv patched so
    its module-scope argparse sees only defaults; wandb stubbed — not in the
    image)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "wandb" not in sys.modules:
        w = types.ModuleType("wandb")
        w.init = w.log = w.watch = lambda *a, **k: None
        sys.modules["wandb"] = w
    argv, sys.argv = sys.argv, ["train_sd.py"]
    try:
        mod = importlib.import_module("train_sd")
    finally:
        sys.argv = argv
    return mod, importlib.import_module("utils")


def _ref_net(module_name: str, **kw):
    """Random-init reference TSN with BN stats calibrated by a few
    train-mode forwards (same recipe as test_reference_parity) and dropout
    disabled in place (base_model.fc is the Dropout module,
    models_SD.py:180-182) so the trajectory is deterministic."""
    mod = importlib.import_module(f"models.{module_name}")
    torch.manual_seed(0)
    # fc_lr5=True: the trainers pass it explicitly (train_mtmm.py:564,
    # train_sd.py main) — the constructor default is False and silently
    # drops the x5/x10 head multipliers
    net = mod.TSN(CLS, T, "RGB", base_model="resnet50", is_shift=True,
                  shift_div=8, pretrain="", print_spec=False,
                  partial_bn=False, fc_lr5=True, **kw)
    net.base_model.fc.p = 0.0
    net.train()
    gen = np.random.default_rng(99)
    with torch.no_grad():
        for _ in range(8):
            x = torch.from_numpy(
                gen.standard_normal((N, T, 3, H, H)).astype(np.float32))
            net(x)
    return net


def _convert(net, arch: str, **vkw):
    # dropout=0.0 on the flax side mirrors the zeroed torch Dropout p
    # (flax Dropout with rate 0 is an exact identity)
    model = variant(arch, num_class=CLS, num_segments=T,
                    base_model="resnet50", temporal="action", dropout=0.0,
                    partial_bn=False, **vkw)
    x0 = jnp.zeros((N, T, H, H, 3), jnp.float32)
    variables = jax.jit(
        lambda r, x: model.init(r, x, train=False))(
            {"params": jax.random.key(0)}, x0)
    new_vars, missing = convert_state_dict(net.state_dict(), variables)
    assert not missing, missing[:8]
    return model, new_vars


def _batches(n_steps, seed=0, with_depth=False):
    """Identical uint8 batches for both sides; the torch input replicates
    normalize_clip's exact f32 scale/bias formula."""
    gen = np.random.default_rng(seed)
    scale = ((1.0 / 255.0) / np.asarray(STD, np.float32)).astype(np.float32)
    bias = (-np.asarray(MEAN, np.float32)
            / np.asarray(STD, np.float32)).astype(np.float32)
    out = []
    for _ in range(n_steps):
        u8 = gen.integers(0, 256, (N, T, H, H, 3), dtype=np.uint8)
        y = gen.integers(0, CLS, (N,), dtype=np.int64)
        xt = torch.from_numpy(np.ascontiguousarray(
            (u8.astype(np.float32) * scale + bias).transpose(0, 1, 4, 2, 3)))
        batch = {"rgb": jnp.asarray(u8), "label": jnp.asarray(y)}
        extra = {}
        if with_depth:
            d8 = gen.integers(0, 256, (N, T, H, H, 1), dtype=np.uint8)
            batch["depth"] = jnp.asarray(d8)
            extra["n_depth"] = torch.from_numpy(
                d8.astype(np.float32) / 255.0).permute(0, 1, 4, 2, 3)
        out.append((batch, xt, torch.from_numpy(y), extra))
    return out


def _torch_optimizer(net):
    """SGD over get_optim_policies with lr/wd multipliers, exactly as
    train_sd.py:652-660 / train_mtmm.py:567-585 wire it."""
    policies = net.get_optim_policies()
    for g in policies:
        g["lr"] = LR * g["lr_mult"]
        g["weight_decay"] = WD * g["decay_mult"]
    return torch.optim.SGD(policies, momentum=MOM)


def _jax_tx(params, lr_steps):
    labels = label_params(params, fc_lr5=True, partial_bn=False)
    return sgd_policies(labels, base_lr=LR, momentum=MOM, weight_decay=WD,
                        lr_steps=lr_steps, gamma=0.1, steps_per_epoch=1)


def _compare_deltas(p0, got, want, what, leaf_rel=0.3, global_rel=0.03,
                    atol=1e-6):
    """Compare parameter UPDATES (final - initial) leaf-by-leaf.

    Comparing raw params would hide real divergence behind the large static
    values; comparing deltas exposes it.  Per-leaf tolerance is relative to
    that leaf's torch update norm (the ME-branch/BN leaves carry tiny
    updates dominated by fp32 cancellation noise — measured ~10% relative on
    norms of 1e-6..1e-3 while the big movers agree to <1%); the global
    concatenated check pins overall trajectory agreement tightly."""
    f0 = flatten_dict(p0)
    fg = flatten_dict(got)
    fw = flatten_dict(want)
    assert fg.keys() == fw.keys() == f0.keys()
    num = den = 0.0
    for k in fg:
        dj = np.asarray(fg[k], np.float64) - np.asarray(f0[k], np.float64)
        dt = np.asarray(fw[k], np.float64) - np.asarray(f0[k], np.float64)
        err = float(np.linalg.norm(dj - dt))
        ref = float(np.linalg.norm(dt))
        num += err ** 2
        den += ref ** 2
        assert err <= atol + leaf_rel * ref, (
            f"{what}: {'/'.join(map(str, k))}: |dj-dt|={err:.3e} "
            f"vs {atol} + {leaf_rel}*|dt|={leaf_rel * ref:.3e}")
    g = (num / max(den, 1e-30)) ** 0.5
    assert g <= global_rel, f"{what}: global delta error {g:.4f} > {global_rel}"


def _check_step1_deltas(p0, state, net, ema, what):
    """Full-tree update parity after the FIRST step: grads -> policy lr/wd
    -> momentum(0-init) -> EMA blend, compared leaf-by-leaf before chaotic
    amplification sets in (see class docstring)."""
    final_vars = {"params": state.params, "batch_stats": state.batch_stats}
    want_vars, missing = convert_state_dict(net.state_dict(), final_vars)
    assert not missing
    _compare_deltas(p0["params"], final_vars["params"], want_vars["params"],
                    f"{what} step-1 params")
    _compare_deltas(p0["batch_stats"], final_vars["batch_stats"],
                    want_vars["batch_stats"], f"{what} step-1 BN stats")
    ema_vars, missing = convert_state_dict(
        ema.model.state_dict(),
        {"params": state.ema_params, "batch_stats": state.ema_batch_stats})
    assert not missing
    # EMA one-step deltas are decay*(1-decay)-scaled (~1% of the param
    # deltas) and sit at the f32 rounding floor of the blend arithmetic —
    # measured |dj-dt| ~ 2e-6 norms on million-element leaves; the raised
    # atol keeps the check binding for the leaves that actually move (BN
    # affines, heads) without asserting on rounding noise.
    _compare_deltas(p0["params"], state.ema_params, ema_vars["params"],
                    f"{what} step-1 EMA params", atol=1e-5, global_rel=0.1)
    _compare_deltas(p0["batch_stats"], state.ema_batch_stats,
                    ema_vars["batch_stats"], f"{what} step-1 EMA BN stats",
                    atol=1e-5, global_rel=0.1)


@pytest.mark.slow
class TestTrajectoryParity:
    """Assertion design, from measurement (round 3): after ONE step every
    leaf's update matches torch to fp32 tolerance, but over K steps the
    per-leaf deltas DECORRELATE even though the loss trajectories track to
    <1% — per-step fp32 gradient noise (reduction-order differences between
    frameworks, worst in the ME branch's cancellation-heavy math) is
    amplified by the training dynamics; at 6 steps the measured global delta
    error is ~60% while losses agree to 1e-2 (and a real composition bug —
    e.g. the fc_lr5 head multiplier or the end-of-epoch decay off-by-one
    this test caught — shifts losses by 4x / 10x immediately).  So: tight
    full-tree delta parity after step 1, loss-trajectory parity across all
    steps spanning two decay engagements."""

    def test_sd_stage_lockstep(self):
        """6 SD steps (1 step == 1 epoch, lr_steps=(2,4) so the end-of-epoch
        decay engages twice mid-run)."""
        ts_mod, ref_utils = _ref_trainer()
        args = ts_mod.args          # defaults: T°=3, alpha=0.1, beta=1e-6
        lr_steps = (2, 4)
        n_steps = 6

        net = _ref_net("models_SD")
        model, variables = _convert(net, "tsn_sd")
        tx = _jax_tx(variables["params"], lr_steps)
        state = create_train_state(variables, tx)
        p0 = jax.tree.map(np.asarray, {"params": state.params,
                                       "batch_stats": state.batch_stats})
        step_fn = make_train_step(model, tx, stage="sd",
                                  loss_cfg=LossConfig(), ema_decay=EMA_DECAY,
                                  mean=MEAN, std=STD, donate=False)

        opt = _torch_optimizer(net)
        ema = ts_mod.EMAWrapper(net, decay=EMA_DECAY)
        criterion = tnn.CrossEntropyLoss()
        data = _batches(n_steps, seed=11)
        rng = jax.random.key(42)

        torch_losses, jax_losses = [], []
        net.train()
        for epoch, (batch, xt, yt, _) in enumerate(data):
            # --- reference composition (train_sd.py:225-282) ---
            out, m1, m2, m3, ffea, f1, f2, f3 = net(xt)
            ce = criterion(out, yt)
            mces = [criterion(m, yt) for m in (m1, m2, m3)]
            temp4 = torch.softmax(out / args.temperature, dim=1)
            kds = [ts_mod.kd_loss_function(m, temp4.detach(), args)
                   * (args.temperature ** 2) for m in (m1, m2, m3)]
            feats = [ts_mod.feature_loss_function(f, ffea.detach())
                     for f in (f1, f2, f3)]
            total = ((1 - args.alpha) * (ce + sum(mces))
                     + args.alpha * sum(kds) + args.beta * sum(feats))
            opt.zero_grad()
            total.backward()
            opt.step()
            ema.update(net)
            ref_utils.adjust_learning_rate(LR, opt, epoch, lr_steps)
            torch_losses.append(float(total))

            # --- our jitted step ---
            state, metrics = step_fn(state, batch, rng)
            jax_losses.append(float(metrics["loss"]))
            if epoch == 0:
                _check_step1_deltas(p0, state, net, ema, "SD")

        np.testing.assert_allclose(jax_losses, torch_losses, rtol=1e-2,
                                   err_msg="per-step SD total losses")

    def test_mtmm_stage_lockstep(self):
        """4 MTMM steps: CE + 0.01*MSE(depth, F.interpolate(n_depth)) per
        train_mtmm.py:223-231 (depth target at train-crop//4 for this
        geometry), same SGD/EMA/decay composition."""
        ts_mod, ref_utils = _ref_trainer()
        lr_steps = (2,)
        n_steps = 4
        depth_size = H // 4

        net = _ref_net("models_MTMM", modal="rgb_depth")
        model, variables = _convert(net, "tsn_mtmm")
        tx = _jax_tx(variables["params"], lr_steps)
        state = create_train_state(variables, tx)
        p0 = jax.tree.map(np.asarray, {"params": state.params,
                                       "batch_stats": state.batch_stats})
        step_fn = make_train_step(
            model, tx, stage="mtmm",
            loss_cfg=LossConfig(depth_size=depth_size), ema_decay=EMA_DECAY,
            mean=MEAN, std=STD, donate=False)

        opt = _torch_optimizer(net)
        ema = ts_mod.EMAWrapper(net, decay=EMA_DECAY)
        criterion = tnn.CrossEntropyLoss()
        mse = tnn.MSELoss()
        data = _batches(n_steps, seed=13, with_depth=True)
        rng = jax.random.key(43)

        torch_losses, jax_losses = [], []
        net.train()
        for epoch, (batch, xt, yt, extra) in enumerate(data):
            out, g_depth_out = net(xt)
            n_depth = extra["n_depth"]
            n_l = n_depth.reshape(-1, 1, H, H)
            g_gt = F.interpolate(n_l, size=(depth_size, depth_size),
                                 mode="bilinear")
            total = criterion(out, yt) + 0.01 * mse(g_depth_out, g_gt)
            opt.zero_grad()
            total.backward()
            opt.step()
            ema.update(net)
            ref_utils.adjust_learning_rate(LR, opt, epoch, lr_steps)
            torch_losses.append(float(total))

            state, metrics = step_fn(state, batch, rng)
            jax_losses.append(float(metrics["loss"]))
            if epoch == 0:
                _check_step1_deltas(p0, state, net, ema, "MTMM")

        np.testing.assert_allclose(jax_losses, torch_losses, rtol=1e-2,
                                   err_msg="per-step MTMM total losses")
