"""Optimizer-policy tests: label assignment goldens + numerical parity of
the policy SGD vs torch.optim.SGD with per-group lr/wd, plus the step-decay
schedule (``models_MTMM.py:180-266``, ``utils.py:39-46``)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict

from ehgr_tpu.train.optim import (GROUPS, build_optimizer, label_params,
                                  sgd_policies, step_decay_factor)


def tiny_params(rng):
    def r(*s):
        return jnp.asarray(rng.standard_normal(s), jnp.float32)

    return {
        "base_model": {
            "conv1": {"kernel": r(7, 7, 3, 64)},
            "bn1": {"scale": r(64), "bias": r(64)},
            "layer1_0": {
                "conv1": {
                    "shift_w": r(3, 64),
                    "p2_squeeze": {"kernel": r(64, 4)},
                    "p3_bn1": {"scale": r(4), "bias": r(4)},
                    "net": {"kernel": r(1, 1, 64, 64)},
                },
                "bn1": {"scale": r(64), "bias": r(64)},
                "conv2": {"kernel": r(3, 3, 64, 64)},
            },
        },
        "global_decoder": {
            "conv0": {"kernel": r(3, 3, 2048, 256)},
            "bn0": {"scale": r(256), "bias": r(256)},
            "conv4": {"kernel": r(1, 1, 32, 1), "bias": r(1)},
        },
        "new_fc": {"kernel": r(2048, 83), "bias": r(83)},
        "middle_fc1": {"kernel": r(2048, 83), "bias": r(83)},
    }


class TestLabels:
    def test_group_assignment(self, rng):
        labels = flatten_dict(label_params(tiny_params(rng), fc_lr5=True,
                                           partial_bn=False))
        want = {
            ("base_model", "conv1", "kernel"): "first_conv_weight",
            ("base_model", "bn1", "scale"): "bn",
            ("base_model", "layer1_0", "conv1", "shift_w"): "custom_weight",
            ("base_model", "layer1_0", "conv1", "p2_squeeze", "kernel"):
                "custom_weight",
            ("base_model", "layer1_0", "conv1", "p3_bn1", "scale"):
                "custom_bn",
            ("base_model", "layer1_0", "conv1", "net", "kernel"):
                "normal_weight",
            ("base_model", "layer1_0", "bn1", "bias"): "bn",
            ("base_model", "layer1_0", "conv2", "kernel"): "normal_weight",
            ("global_decoder", "conv0", "kernel"): "normal_weight",
            ("global_decoder", "bn0", "scale"): "bn",
            ("global_decoder", "conv4", "bias"): "normal_bias",
            ("new_fc", "kernel"): "lr5_weight",
            ("new_fc", "bias"): "lr10_bias",
            ("middle_fc1", "kernel"): "lr5_weight",
        }
        for path, lab in want.items():
            assert labels[path] == lab, (path, labels[path])

    def test_partial_bn_freezes_non_stem(self, rng):
        labels = flatten_dict(label_params(tiny_params(rng), partial_bn=True))
        assert labels[("base_model", "bn1", "scale")] == "bn"
        assert labels[("base_model", "layer1_0", "bn1", "scale")] == "frozen"
        assert labels[("base_model", "layer1_0", "conv1", "p3_bn1",
                       "scale")] == "frozen"


class TestSgdParity:
    def test_matches_torch_groups(self, rng):
        """3 steps of policy-SGD == torch.optim.SGD with equivalent groups."""
        base_lr, mom, wd = 0.00125, 0.9, 1e-5
        params = tiny_params(rng)
        labels = label_params(params)
        flat_p = flatten_dict(params)
        flat_l = flatten_dict(labels)

        # torch mirror
        tparams = {k: torch.nn.Parameter(torch.from_numpy(np.array(v)))
                   for k, v in flat_p.items()}
        groups = []
        for k, p in tparams.items():
            lm, dm = GROUPS[flat_l[k]]
            groups.append({"params": [p], "lr": base_lr * lm,
                           "weight_decay": wd * dm})
        opt = torch.optim.SGD(groups, momentum=mom)

        tx = sgd_policies(labels, base_lr, mom, wd, lr_steps=(100,),
                          steps_per_epoch=10)
        opt_state = tx.init(params)

        g_rng = np.random.default_rng(1)
        cur = params
        for _ in range(3):
            flat_g = {k: g_rng.standard_normal(np.shape(v)).astype(np.float32)
                      for k, v in flat_p.items()}
            # jax step
            from flax.traverse_util import unflatten_dict
            grads = unflatten_dict(
                {k: jnp.asarray(v) for k, v in flat_g.items()})
            updates, opt_state = tx.update(grads, opt_state, cur)
            import optax
            cur = optax.apply_updates(cur, updates)
            # torch step
            opt.zero_grad()
            for k, p in tparams.items():
                p.grad = torch.from_numpy(flat_g[k])
            opt.step()

        flat_cur = flatten_dict(cur)
        for k, p in tparams.items():
            np.testing.assert_allclose(
                np.asarray(flat_cur[k]), p.detach().numpy(),
                rtol=1e-5, atol=1e-6, err_msg=str(k))


class TestSchedule:
    def test_step_decay(self):
        f = lambda e: float(step_decay_factor(jnp.asarray(e), (10, 15, 20)))
        assert f(0) == 1.0
        assert f(9) == 1.0
        np.testing.assert_allclose(f(10), 0.1)
        np.testing.assert_allclose(f(15), 0.01, rtol=1e-6)
        np.testing.assert_allclose(f(24), 0.001, rtol=1e-6)

    def test_end_of_epoch_decay_composition(self, rng):
        """The reference adjusts the LR at the END of each epoch
        (train_mtmm.py:612-613), so with lr_steps=[2] epoch 2 still trains
        at full lr and epoch 3 is the first decayed one (verified vs the
        reference run log: epoch 10 @ 0.00125, epoch 11 @ 0.00013 with
        lr_steps=[10,15,20]).  The factor actually applied per step must
        reflect that."""
        params = {"w": jnp.ones((3,), jnp.float32)}
        labels = {"w": "normal_weight"}
        base_lr = 1.0
        tx = sgd_policies(labels, base_lr, momentum=0.0, weight_decay=0.0,
                          lr_steps=(2,), steps_per_epoch=1)
        state = tx.init(params)
        grads = {"w": jnp.ones((3,), jnp.float32)}
        applied = []
        cur = params
        for _ in range(4):                      # epochs 0..3 (1 step each)
            updates, state = tx.update(grads, state, cur)
            applied.append(float(-updates["w"][0]))   # = lr used this epoch
        np.testing.assert_allclose(applied, [1.0, 1.0, 1.0, 0.1], rtol=1e-6)


class TestScheduleAsState:
    """Schedule hyperparameters live in the optimizer STATE, not the traced
    program: any (lr, lr_steps, gamma, steps_per_epoch, momentum, wd) choice
    must produce the IDENTICAL jaxpr — one compiled executable for every
    schedule, so the persistent jit cache hits across hyperparameter changes
    (full train-step recompiles cost ~10 min through the TPU tunnel)."""

    def _jaxpr(self, **kw):
        import jax
        import jax.numpy as jnp

        from ehgr_tpu.train.optim import label_params, sgd_policies

        params = {"base_model": {"conv1": {"kernel": jnp.zeros((3, 3, 3, 4)),
                                           "bias": jnp.zeros(4)}},
                  "new_fc": {"kernel": jnp.zeros((4, 2)),
                             "bias": jnp.zeros(2)}}
        tx = sgd_policies(label_params(params), **kw)
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        return str(jax.make_jaxpr(
            lambda g, s, p: tx.update(g, s, p))(grads, state, params))

    def test_jaxpr_identical_across_schedules(self):
        a = self._jaxpr(base_lr=0.01, lr_steps=(10,), gamma=0.1,
                        steps_per_epoch=16, momentum=0.9, weight_decay=1e-5)
        b = self._jaxpr(base_lr=0.04, lr_steps=(5, 9, 13), gamma=0.2,
                        steps_per_epoch=128, momentum=0.8, weight_decay=1e-4)
        assert a == b

    def test_values_come_from_state(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from ehgr_tpu.train.optim import label_params, sgd_policies

        params = {"new_fc": {"kernel": jnp.ones((2, 2))}}
        labels = label_params(params)
        tx = sgd_policies(labels, base_lr=0.5, momentum=0.0,
                          weight_decay=0.0, lr_steps=(100,),
                          steps_per_epoch=1)
        state = tx.init(params)
        grads = {"new_fc": {"kernel": jnp.ones((2, 2))}}
        upd, _ = tx.update(grads, state, params)
        # fc kernel group is lr5_weight: lr = 0.5 * 5
        np.testing.assert_allclose(np.asarray(upd["new_fc"]["kernel"]),
                                   -2.5, rtol=1e-6)


class TestAdoptConfigHyper:
    """Full-state resume takes the CURRENT config's schedule (ADVICE r4):
    momentum buffers + step come from the checkpoint, hyper from config."""

    def _tx_state(self, lr, params):
        import jax.numpy as jnp

        from ehgr_tpu.train.optim import label_params, sgd_policies

        tx = sgd_policies(label_params(params), base_lr=lr, momentum=0.9,
                          weight_decay=1e-5, lr_steps=(10,),
                          steps_per_epoch=4)
        return tx, tx.init(params)

    def test_hyper_replaced_momentum_kept(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from ehgr_tpu.train.optim import adopt_config_hyper

        params = {"new_fc": {"kernel": jnp.ones((2, 2))}}
        tx_old, restored = self._tx_state(0.5, params)
        # simulate a trained checkpoint: momentum buffer non-zero, step 7
        restored = restored._replace(
            step=jnp.asarray(7, jnp.int32),
            momentum=jax.tree.map(lambda p: p * 3.0, params))
        _, fresh = self._tx_state(0.125, params)

        merged = adopt_config_hyper(restored, fresh)
        assert int(merged.step) == 7
        np.testing.assert_allclose(
            np.asarray(merged.momentum["new_fc"]["kernel"]), 3.0)
        # schedule comes from the NEW config (lr5 group: 0.125 * 5)
        np.testing.assert_allclose(
            float(merged.hyper["group_lr"]["lr5_weight"]), 0.625)

    def test_chained_state_traversed(self):
        import jax.numpy as jnp
        import numpy as np
        import optax

        from ehgr_tpu.train.optim import (adopt_config_hyper, label_params,
                                          sgd_policies)

        params = {"new_fc": {"kernel": jnp.ones((2, 2))}}

        def chained(lr):
            tx = optax.chain(
                optax.clip_by_global_norm(1.0),
                sgd_policies(label_params(params), base_lr=lr,
                             steps_per_epoch=4))
            return tx.init(params)

        restored, fresh = chained(0.5), chained(0.125)
        merged = adopt_config_hyper(restored, fresh)
        np.testing.assert_allclose(
            float(merged[1].hyper["group_lr"]["normal_weight"]), 0.125)

    def test_warns_on_schedule_change(self, caplog):
        import logging

        import jax.numpy as jnp

        from ehgr_tpu.train.optim import adopt_config_hyper

        params = {"new_fc": {"kernel": jnp.ones((2, 2))}}
        _, restored = self._tx_state(0.5, params)
        _, fresh = self._tx_state(0.125, params)
        log = logging.getLogger("test_adopt")
        with caplog.at_level(logging.WARNING, logger="test_adopt"):
            adopt_config_hyper(restored, fresh, log)
        assert any("CURRENT config" in r.message for r in caplog.records)
