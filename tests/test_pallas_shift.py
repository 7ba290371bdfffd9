"""Pallas shift kernel parity vs the XLA slice/concat formulation — forward
AND backward (the kernel is linear; its VJP is the mirrored shift).  Runs in
interpreter mode on the CPU mesh; the same kernel compiles on TPU."""

import numpy as np

import jax
import jax.numpy as jnp

from ehgr_tpu.ops.pallas.shift import tsm_shift_pallas
from ehgr_tpu.ops.temporal_shift import temporal_shift


class TestPallasShift:
    def test_forward_parity(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8, 4, 4, 16)), jnp.float32)
        got = tsm_shift_pallas(x, 8, True)
        want = temporal_shift(x, 8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6)

    def test_edge_zero_padding(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 4, 2, 2, 8)), jnp.float32)
        out = np.asarray(tsm_shift_pallas(x, 8, True))
        fold = 1
        # last frame's left-shifted channels and first frame's right-shifted
        # channels are zero
        np.testing.assert_array_equal(out[0, -1, ..., :fold], 0)
        np.testing.assert_array_equal(out[0, 0, ..., fold:2 * fold], 0)

    def test_grad_parity(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 6, 3, 3, 8)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((1, 6, 3, 3, 8)), jnp.float32)

        g_pallas = jax.grad(
            lambda y: jnp.sum(tsm_shift_pallas(y, 8, True) * w))(x)
        g_xla = jax.grad(lambda y: jnp.sum(temporal_shift(y, 8) * w))(x)
        np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla),
                                   rtol=1e-6)

    def test_jit(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 4, 2, 2, 8)), jnp.float32)
        out = jax.jit(lambda y: tsm_shift_pallas(y, 8, True))(x)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(temporal_shift(x, 8)),
                                   rtol=1e-6)
