"""Kernel-parity tests for temporal shift — the TPU analogue of the
reference's only assert-based test (``temporal_shift.py:158-207``)."""

import jax
import jax.numpy as jnp
import numpy as np

from ehgr_tpu.ops import temporal_shift as ts
from ehgr_tpu.ops.consensus import consensus


def reference_shift(x: np.ndarray, fold_div: int) -> np.ndarray:
    """Straight transcription of the TSM zero-pad shift semantics
    (``temporal_shift.py:136-154``) in numpy, channels-last."""
    n, t, h, w, c = x.shape
    fold = c // fold_div
    out = np.zeros_like(x)
    out[:, :-1, ..., :fold] = x[:, 1:, ..., :fold]           # shift left
    out[:, 1:, ..., fold:2 * fold] = x[:, :-1, ..., fold:2 * fold]  # right
    out[..., 2 * fold:] = x[..., 2 * fold:]
    return out


class TestTemporalShift:
    def test_matches_reference_semantics(self, rng):
        x = rng.standard_normal((2, 8, 4, 4, 16)).astype(np.float32)
        got = np.asarray(ts.temporal_shift(jnp.asarray(x), fold_div=8))
        np.testing.assert_allclose(got, reference_shift(x, 8), rtol=1e-6)

    def test_grad_flows(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 4, 2, 2, 8)).astype(np.float32))
        g = jax.grad(lambda y: jnp.sum(ts.temporal_shift(y) ** 2))(x)
        assert g.shape == x.shape
        assert not np.allclose(np.asarray(g), 0)

    def test_jit_compiles(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 8, 4, 4, 8)).astype(np.float32))
        out = jax.jit(ts.temporal_shift)(x)
        np.testing.assert_allclose(
            np.asarray(out), reference_shift(np.asarray(x), 8), rtol=1e-6)


class TestLearnableShift:
    def test_tsm_init_equals_tsm_shift(self, rng):
        """With the TSM init the learnable conv1d IS the TSM shift
        (``action.py:25-36``)."""
        c = 16
        x = rng.standard_normal((2, 8, 3, 3, c)).astype(np.float32)
        w = ts.tsm_shift_init(c, fold_div=8)
        got = np.asarray(ts.learnable_shift(jnp.asarray(x), w))
        np.testing.assert_allclose(got, reference_shift(x, 8), rtol=1e-6)

    def test_matches_torch_depthwise_conv1d(self, rng):
        """Parity vs torch Conv1d(groups=C, k=3, pad=1) — the exact reference
        layer — on random weights."""
        import torch

        n, t, h, w_, c = 2, 8, 2, 2, 12
        x = rng.standard_normal((n, t, h, w_, c)).astype(np.float32)
        taps = rng.standard_normal((3, c)).astype(np.float32)

        got = np.asarray(ts.learnable_shift(jnp.asarray(x), jnp.asarray(taps)))

        conv = torch.nn.Conv1d(c, c, 3, padding=1, groups=c, bias=False)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(taps.T[:, None, :]))
        # torch path mirrors action.py:65-73: [N,T,H,W,C] -> [N*H*W, C, T]
        xt = torch.from_numpy(x).permute(0, 2, 3, 4, 1).reshape(n * h * w_, c, t)
        ref = conv(xt).reshape(n, h, w_, c, t).permute(0, 4, 1, 2, 3)
        np.testing.assert_allclose(got, ref.detach().numpy(),
                                   rtol=1e-5, atol=1e-5)


class TestTemporalPool:
    def test_matches_torch_maxpool3d(self, rng):
        import torch

        x = rng.standard_normal((2, 8, 3, 3, 4)).astype(np.float32)
        got = np.asarray(ts.temporal_pool(jnp.asarray(x)))
        xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)  # N,C,T,H,W
        ref = torch.nn.functional.max_pool3d(
            xt, kernel_size=(3, 1, 1), stride=(2, 1, 1), padding=(1, 0, 0))
        ref = ref.permute(0, 2, 3, 4, 1).numpy()
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-6)


class TestConsensus:
    def test_avg(self, rng):
        x = jnp.asarray(rng.standard_normal((4, 8, 83)).astype(np.float32))
        out = consensus(x, "avg")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(x).mean(axis=1), rtol=1e-6)

    def test_identity(self, rng):
        x = jnp.asarray(rng.standard_normal((4, 8, 83)).astype(np.float32))
        assert consensus(x, "identity") is x
