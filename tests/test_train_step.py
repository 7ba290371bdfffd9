"""End-to-end single-step training tests on synthetic frames (SURVEY.md §4
item 4) + multi-device data-parallel execution on the virtual 8-CPU mesh
(item 5)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ehgr_tpu.configs import LossConfig, OptimConfig
from ehgr_tpu.models.tsn import variant
from ehgr_tpu.parallel.mesh import make_mesh, shard_batch
from ehgr_tpu.train.optim import build_optimizer
from ehgr_tpu.train.steps import (TrainState, create_train_state,
                                  make_eval_step, make_train_step)

N, T, HW, CLS = 8, 4, 32, 7
MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


def make_batch(rng, with_depth=False):
    batch = {
        "rgb": jnp.asarray(rng.integers(0, 256, (N, T, HW, HW, 3)),
                           jnp.uint8),
        "label": jnp.asarray(rng.integers(0, CLS, (N,))),
    }
    if with_depth:
        batch["depth"] = jnp.asarray(
            rng.integers(0, 256, (N, T, HW, HW, 1)), jnp.uint8)
    return batch


def build(stage, arch, rng, loss_cfg=None):
    # partial_bn=False matches the reference recipes (no --npb passed);
    # with fresh running stats, frozen BNs would let activations blow up.
    model = variant(arch, num_class=CLS, num_segments=T, temporal="action",
                    partial_bn=False)
    x = jnp.zeros((2, T, HW, HW, 3), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    tx, _ = build_optimizer(variables["params"], OptimConfig(lr=0.00125),
                            steps_per_epoch=10)
    state = create_train_state(variables, tx)
    loss_cfg = loss_cfg or LossConfig(depth_size=8)
    step = make_train_step(model, tx, stage=stage, loss_cfg=loss_cfg,
                           ema_decay=0.99, mean=MEAN, std=STD, donate=False)
    return model, state, step


class TestTrainSteps:
    @pytest.mark.parametrize("stage,arch,with_depth", [
        ("baseline", "tsn", False),
        ("mtmm", "tsn_mtmm", True),
        ("sd", "tsn_sd", False),
        ("mtmm_sd", "tsn_mtmm_sd", True),
    ])
    def test_step_runs_and_updates(self, stage, arch, with_depth, rng):
        model, state, step = build(stage, arch, rng)
        batch = make_batch(rng, with_depth)
        new_state, metrics = step(state, batch, jax.random.key(0))

        assert int(new_state.step) == 1
        assert np.isfinite(float(metrics["loss"]))
        # params moved
        moved = jax.tree.map(
            lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
            state.params, new_state.params)
        assert any(jax.tree.leaves(moved))
        # EMA moved toward params but is not equal to them
        ema_leaf = jax.tree.leaves(new_state.ema_params)[0]
        p_leaf = jax.tree.leaves(new_state.params)[0]
        o_leaf = jax.tree.leaves(state.params)[0]
        assert not np.allclose(np.asarray(ema_leaf), np.asarray(p_leaf))

    def test_loss_decreases_on_fixed_batch(self, rng):
        _, state, step = build("baseline", "tsn", rng)
        batch = make_batch(rng)
        losses = []
        for i in range(4):
            state, m = step(state, batch, jax.random.key(0))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], losses

    def test_eval_step(self, rng):
        model, state, step = build("baseline", "tsn", rng)
        ev = make_eval_step(model, mean=MEAN, std=STD)
        res = ev(state, make_batch(rng))
        assert int(res["n"]) == N
        assert 0 <= int(res["final_top1"]) <= N


class TestDataParallel:
    def test_sharded_step_matches_single_device(self, rng):
        """The jitted step under an 8-device data mesh computes the same
        update as single-device (GSPMD all-reduce == one big batch)."""
        _, state, step = build("baseline", "tsn", rng)
        batch = make_batch(rng)

        single_state, single_m = step(state, batch, jax.random.key(0))

        mesh = make_mesh(8)
        sh_batch = shard_batch(batch, mesh)
        from ehgr_tpu.parallel.mesh import replicated
        sh_state = jax.tree.map(
            lambda x: jax.device_put(x, replicated(mesh)), state)
        multi_state, multi_m = step(sh_state, sh_batch, jax.random.key(0))

        np.testing.assert_allclose(float(single_m["loss"]),
                                   float(multi_m["loss"]), rtol=1e-4)
        a = jax.tree.leaves(single_state.params)[0]
        b = jax.tree.leaves(multi_state.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

    def test_bn_stats_are_global(self, rng):
        """Batch stats under the sharded step equal the single-device stats
        (sync-BN for free via GSPMD)."""
        _, state, step = build("baseline", "tsn", rng)
        batch = make_batch(rng)
        s1, _ = step(state, batch, jax.random.key(0))

        mesh = make_mesh(8)
        from ehgr_tpu.parallel.mesh import replicated
        s2, _ = step(
            jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), state),
            shard_batch(batch, mesh), jax.random.key(0))
        m1 = s1.batch_stats["base_model"]["bn1"]["mean"]
        m2 = s2.batch_stats["base_model"]["bn1"]["mean"]
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2),
                                   rtol=1e-4, atol=1e-6)
