"""ACTION megakernel parity vs the XLA formulation (interpret mode on CPU;
the identical kernels compile on TPU — measured in docs/PERF.md)."""

import numpy as np

import jax
import jax.numpy as jnp

from ehgr_tpu.ops.action import ActionConv
from ehgr_tpu.ops.pallas.action_mega import (action_apply, action_stats,
                                             ste_stencil)
from ehgr_tpu.ops.temporal_shift import learnable_shift

N, T, H, W, C = 2, 4, 8, 8, 32
CR = C // 16
F = 16


class TestMegaSweeps:
    def test_stats_match_xla(self, rng):
        x5 = jnp.asarray(rng.standard_normal((N, T, H, W, C)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, C)), jnp.float32)
        wp3 = jnp.asarray(rng.standard_normal((C, CR)), jnp.float32)

        x4 = x5.reshape(N, T, H * W, C)
        mc, pooled, x3 = action_stats(x4, w, wp3, interpret=True)
        xs_ref = learnable_shift(x5, w)
        np.testing.assert_allclose(
            np.asarray(mc.reshape(N, T, H, W)),
            np.asarray(jnp.mean(xs_ref, -1)), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(pooled), np.asarray(jnp.mean(xs_ref, axis=(2, 3))),
            rtol=1e-4, atol=1e-5)
        x3_ref = jnp.einsum("nthwc,cr->nthwr", xs_ref, wp3)
        np.testing.assert_allclose(
            np.asarray(x3.reshape(N, T, H, W, CR)), np.asarray(x3_ref),
            rtol=1e-4, atol=1e-4)

    def test_apply_matches_xla(self, rng):
        x5 = jnp.asarray(rng.standard_normal((N, T, H, W, C)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, C)), jnp.float32)
        g1 = jnp.asarray(rng.uniform(0, 1, (N, T, H, W)), jnp.float32)
        gch = jnp.asarray(rng.uniform(3, 5, (N, T, C)), jnp.float32)
        wn = jnp.asarray(rng.standard_normal((C, F)), jnp.float32)

        out = action_apply(x5.reshape(N, T, H * W, C), w,
                           g1.reshape(N, T, H * W, 1), gch, wn,
                           interpret=True)
        xs = learnable_shift(x5, w)
        gated = xs * (g1[..., None] + gch[:, :, None, None, :])
        want = jnp.einsum("nthwc,cf->nthwf", gated, wn)
        np.testing.assert_allclose(
            np.asarray(out.reshape(N, T, H, W, F)), np.asarray(want),
            rtol=1e-4, atol=1e-4)

    def test_partial_final_block_masked(self, rng):
        """S that doesn't divide into 8-aligned tiles exercises the cdiv
        grid + masked pool accumulation (e.g. the 14^2/7^2 feature maps)."""
        n, t, s, c = 1, 4, 1000, 128  # slab > 1MB -> st=512, last block 488
        x4 = jnp.asarray(rng.standard_normal((n, t, s, c)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, c)), jnp.float32)
        wp3 = jnp.asarray(rng.standard_normal((c, c // 16)), jnp.float32)
        wn = jnp.asarray(rng.standard_normal((c, 8)), jnp.float32)

        mc, pooled, x3 = action_stats(x4, w, wp3, interpret=True)
        x5 = x4.reshape(n, t, s, 1, c)
        xs_ref = learnable_shift(x5, w).reshape(n, t, s, c)
        np.testing.assert_allclose(
            np.asarray(pooled), np.asarray(jnp.mean(xs_ref, axis=2)),
            rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(mc[..., 0]), np.asarray(jnp.mean(xs_ref, -1)),
            rtol=1e-5, atol=1e-5)

        g1 = jnp.asarray(rng.uniform(0, 1, (n, t, s, 1)), jnp.float32)
        gch = jnp.asarray(rng.uniform(3, 5, (n, t, c)), jnp.float32)
        out = action_apply(x4, w, g1, gch, wn, interpret=True)
        want = jnp.einsum("ntsc,cf->ntsf",
                          xs_ref * (g1 + gch[:, :, None, :]), wn)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=1e-4, atol=1e-3)

    def test_ste_stencil_equals_conv3d(self, rng):
        mc = jnp.asarray(rng.standard_normal((N, T, H, W)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 3)), jnp.float32)
        got = ste_stencil(mc, k)
        want = jax.lax.conv_general_dilated(
            mc[..., None], k[..., None, None], (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[..., 0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


class TestActionConvMega:
    def test_mega_equals_xla_path(self, rng):
        """fused='mega' reproduces the default path exactly at eval."""
        x = jnp.asarray(rng.standard_normal((N * T, H, W, C)), jnp.float32)
        base = ActionConv(features=F, n_segment=T)
        variables = base.init(jax.random.key(0), x, train=False)
        want = base.apply(variables, x, train=False)

        mega = ActionConv(features=F, n_segment=T, fused="mega")
        got = mega.apply(variables, x, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_mega_train_falls_back_and_differentiates(self, rng):
        """train=True takes the XLA path (autodiff) even with fused='mega'."""
        x = jnp.asarray(rng.standard_normal((N * T, H, W, C)), jnp.float32)
        mega = ActionConv(features=F, n_segment=T, fused="mega",
                          bn_frozen=False)
        variables = mega.init(jax.random.key(0), x, train=False)

        def loss(params):
            out, _ = mega.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(out ** 2)

        grads = jax.grad(loss)(variables["params"])
        g = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(v))) for v in g)
        assert any(np.any(np.asarray(v) != 0) for v in g)

    def test_param_tree_is_mode_agnostic(self, rng):
        """Same tree entries in every mode (ckpt / torch_import compatible)."""
        x = jnp.asarray(rng.standard_normal((N * T, H, W, C)), jnp.float32)
        trees = []
        for mode in (None, "mega"):
            v = ActionConv(features=F, n_segment=T, fused=mode).init(
                jax.random.key(0), x, train=False)
            trees.append(jax.tree_util.tree_structure(v))
        assert trees[0] == trees[1]
