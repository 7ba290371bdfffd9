"""Parity of the custom-VJP ACTION gate block vs the autodiff XLA path.

``ActionConv(fused='vjp')`` must be a drop-in for the default formulation:
identical param tree (same paths, same init values), identical forward
values, matching gradients for the input and EVERY param, and identical
BatchNorm running-stat updates — in both bn-frozen and bn-train modes.
(The point of the mode is backward HBM structure, not math: docs/PERF.md
round 4; reference math ``/root/reference/models/action.py:61-115``.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ehgr_tpu.ops.action import ActionConv

N, T, H, W, C, F = 2, 4, 6, 6, 32, 16


def _mk(fused, bn_frozen=True, dtype=jnp.float32):
    return ActionConv(features=F, n_segment=T, shift_div=8,
                      bn_frozen=bn_frozen, dtype=dtype, fused=fused)


def _x(seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((N * T, H, W, C)), jnp.float32)


class TestActionVJP:
    def test_param_tree_identical(self):
        x = _x()
        va = _mk(None).init(jax.random.key(0), x, train=False)
        vb = _mk("vjp").init(jax.random.key(0), x, train=False)
        fa = jax.tree_util.tree_leaves_with_path(va)
        fb = jax.tree_util.tree_leaves_with_path(vb)
        assert [p for p, _ in fa] == [p for p, _ in fb]
        for (pa, la), (_, lb) in zip(fa, fb):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                          err_msg=str(pa))

    @pytest.mark.parametrize("train,bn_frozen", [(False, True), (True, True),
                                                 (True, False)])
    def test_forward_equal(self, train, bn_frozen):
        x = _x(1)
        variables = _mk(None, bn_frozen).init(jax.random.key(1), x,
                                              train=False)

        def run(fused):
            m = _mk(fused, bn_frozen)
            if train and not bn_frozen:
                out, _ = m.apply(variables, x, train=True,
                                 mutable=["batch_stats"])
                return out
            return m.apply(variables, x, train=train)

        np.testing.assert_allclose(np.asarray(run(None)),
                                   np.asarray(run("vjp")),
                                   rtol=2e-6, atol=2e-6)

    @pytest.mark.parametrize("bn_frozen", [True, False])
    def test_grads_match_autodiff(self, bn_frozen):
        x = _x(2)
        variables = _mk(None, bn_frozen).init(jax.random.key(2), x,
                                              train=False)
        cot = jnp.asarray(
            np.random.default_rng(3).standard_normal((N * T, H, W, F)),
            jnp.float32)

        def loss(fused, params, xin):
            m = _mk(fused, bn_frozen)
            out = m.apply({"params": params,
                           "batch_stats": variables["batch_stats"]},
                          xin, train=True, mutable=["batch_stats"])[0]
            return jnp.sum(out * cot)

        ga = jax.grad(lambda p, xin: loss(None, p, xin),
                      argnums=(0, 1))(variables["params"], x)
        gb = jax.grad(lambda p, xin: loss("vjp", p, xin),
                      argnums=(0, 1))(variables["params"], x)
        flat_a = jax.tree_util.tree_leaves_with_path(ga)
        flat_b = jax.tree_util.tree_leaves_with_path(gb)
        assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
        for (path, la), (_, lb) in zip(flat_a, flat_b):
            np.testing.assert_allclose(
                np.asarray(la), np.asarray(lb), rtol=3e-4, atol=1e-5,
                err_msg=jax.tree_util.keystr(path))

    def test_bn_stats_update_equal(self):
        x = _x(4)
        variables = _mk(None, bn_frozen=False).init(jax.random.key(4), x,
                                                    train=False)
        sa = _mk(None, bn_frozen=False).apply(
            variables, x, train=True, mutable=["batch_stats"])[1]
        sb = _mk("vjp", bn_frozen=False).apply(
            variables, x, train=True, mutable=["batch_stats"])[1]
        ja = jax.tree_util.tree_leaves_with_path(sa)
        jb = jax.tree_util.tree_leaves_with_path(sb)
        assert [p for p, _ in ja] == [p for p, _ in jb]
        for (path, la), (_, lb) in zip(ja, jb):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=1e-6, atol=1e-7,
                                       err_msg=jax.tree_util.keystr(path))

    def test_bf16_forward_close(self):
        """The bf16 compute path (the production train dtype) stays close
        between modes — same casts, same op order."""
        x = _x(5).astype(jnp.bfloat16)
        variables = _mk(None, dtype=jnp.bfloat16).init(jax.random.key(5), x,
                                                       train=False)
        oa = _mk(None, dtype=jnp.bfloat16).apply(variables, x, train=True,
                                                 mutable=["batch_stats"])[0]
        ob = _mk("vjp", dtype=jnp.bfloat16).apply(variables, x, train=True,
                                                  mutable=["batch_stats"])[0]
        np.testing.assert_allclose(np.asarray(oa, np.float32),
                                   np.asarray(ob, np.float32),
                                   rtol=2e-2, atol=2e-2)
