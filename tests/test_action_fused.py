"""Fused ACTION prologue kernel parity vs the XLA formulation
(interpret mode on CPU; the identical kernel compiles on TPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from ehgr_tpu.ops.action import ActionConv
from ehgr_tpu.ops.pallas.action_fused import action_fused_prologue
from ehgr_tpu.ops.temporal_shift import learnable_shift

N, T, H, W, C = 2, 4, 8, 8, 32
CR = C // 16


class TestFusedPrologue:
    def test_outputs_match_xla(self, rng):
        x5 = jnp.asarray(rng.standard_normal((N, T, H, W, C)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, C)), jnp.float32)
        wp3 = jnp.asarray(rng.standard_normal((C, CR)), jnp.float32)

        xs, mc, pooled, x3 = action_fused_prologue(x5, w, wp3,
                                                   interpret=True)
        xs_ref = learnable_shift(x5, w)
        np.testing.assert_allclose(np.asarray(xs), np.asarray(xs_ref),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(mc), np.asarray(jnp.mean(xs_ref, -1, keepdims=True)),
            rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(pooled), np.asarray(jnp.mean(xs_ref, axis=(2, 3))),
            rtol=1e-4, atol=1e-5)
        x3_ref = jnp.einsum("nthwc,cr->nthwr", xs_ref, wp3)
        np.testing.assert_allclose(np.asarray(x3), np.asarray(x3_ref),
                                   rtol=1e-4, atol=1e-4)

    def test_actionconv_fused_equals_unfused(self, rng):
        """The module's fused eval path reproduces the XLA path exactly."""
        x = jnp.asarray(rng.standard_normal((N * T, H, W, C)), jnp.float32)
        base = ActionConv(features=16, n_segment=T, fused=False)
        variables = base.init(jax.random.key(0), x, train=False)
        want = base.apply(variables, x, train=False)

        # interpret=True path: monkeypatch the kernel entry to interpret mode
        import ehgr_tpu.ops.pallas.action_fused as af

        orig = af.action_fused_prologue
        try:
            af.action_fused_prologue = (
                lambda *a, **k: orig(*a, interpret=True))
            fused = ActionConv(features=16, n_segment=T, fused=True)
            got = fused.apply(variables, x, train=False)
        finally:
            af.action_fused_prologue = orig
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
