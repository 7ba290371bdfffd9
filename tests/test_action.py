"""Numerical parity: flax ActionConv vs a torch functional oracle.

The oracle re-derives the ACTION math (``/root/reference/models/action.py:
61-116``) with torch.nn.functional primitives in NCHW, then we convert the
same random torch weights through ``torch_import.convert_state_dict`` and
check the NHWC flax module reproduces the output to fp32 tolerance.  This is
the highest-value test in the repo: it validates the shift conv, all three
gates, the ME frame-difference offsets, BN eval semantics, and the
weight-conversion transposes in one shot."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ehgr_tpu.models.torch_import import convert_state_dict
from ehgr_tpu.ops.action import ActionConv

N, T, H, W, C, OUT = 2, 8, 6, 6, 32, 16
RED = C // 16


def make_torch_weights(seed=0):
    g = torch.Generator().manual_seed(seed)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.2

    return {
        "action_shift.weight": r(C, 1, 3),
        "action_p1_conv1.weight": r(1, 1, 3, 3, 3),
        "action_p2_squeeze.weight": r(RED, C, 1, 1),
        "action_p2_conv1.weight": r(RED, RED, 3),
        "action_p2_expand.weight": r(C, RED, 1, 1),
        "action_p3_squeeze.weight": r(RED, C, 1, 1),
        "action_p3_bn1.weight": torch.rand(RED, generator=g) + 0.5,
        "action_p3_bn1.bias": r(RED),
        "action_p3_bn1.running_mean": r(RED) * 0.1,
        "action_p3_bn1.running_var": torch.rand(RED, generator=g) + 0.5,
        "action_p3_expand.weight": r(C, RED, 1, 1),
        "net.weight": r(OUT, C, 1, 1),
    }


def torch_action_oracle(x_nchw: torch.Tensor, wts) -> torch.Tensor:
    """Functional NCHW ACTION forward with frozen (eval-mode) BN."""
    nt, c, h, w = x_nchw.shape
    n = nt // T

    # learnable shift: depthwise conv1d over T on a [N*H*W, C, T] view
    xs = x_nchw.view(n, T, c, h, w).permute(0, 3, 4, 2, 1) \
        .reshape(n * h * w, c, T)
    xs = F.conv1d(xs, wts["action_shift.weight"], padding=1, groups=c)
    x_shift = xs.view(n, h, w, c, T).permute(0, 4, 3, 1, 2) \
        .reshape(nt, c, h, w)

    # STE
    p1 = x_shift.view(n, T, c, h, w).transpose(2, 1).mean(1, keepdim=True)
    p1 = F.conv3d(p1, wts["action_p1_conv1.weight"], padding=1)
    p1 = torch.sigmoid(p1.transpose(2, 1).reshape(nt, 1, h, w))
    x_p1 = x_shift * p1 + x_shift

    # CE
    p2 = F.adaptive_avg_pool2d(x_shift, 1)
    p2 = F.conv2d(p2, wts["action_p2_squeeze.weight"])
    p2 = p2.view(n, T, RED).transpose(2, 1)
    p2 = F.conv1d(p2, wts["action_p2_conv1.weight"], padding=1)
    p2 = F.relu(p2)
    p2 = p2.transpose(2, 1).reshape(nt, RED, 1, 1)
    p2 = torch.sigmoid(F.conv2d(p2, wts["action_p2_expand.weight"]))
    x_p2 = x_shift * p2 + x_shift

    # ME
    x3 = F.conv2d(x_shift, wts["action_p3_squeeze.weight"])
    x3 = F.batch_norm(x3, wts["action_p3_bn1.running_mean"],
                      wts["action_p3_bn1.running_var"],
                      wts["action_p3_bn1.weight"], wts["action_p3_bn1.bias"],
                      training=False, eps=1e-5)
    x3c = F.conv2d(x3, wts["action_p3_conv1.weight"], padding=1, groups=RED)
    prev = x3.view(n, T, RED, h, w)[:, :T - 1]
    nxt = x3c.view(n, T, RED, h, w)[:, 1:]
    diff = nxt - prev
    diff = F.pad(diff, (0, 0, 0, 0, 0, 0, 0, 1))
    p3 = F.adaptive_avg_pool2d(diff.reshape(nt, RED, h, w), 1)
    p3 = torch.sigmoid(F.conv2d(p3, wts["action_p3_expand.weight"]))
    x_p3 = x_shift * p3 + x_shift

    return F.conv2d(x_p1 + x_p2 + x_p3, wts["net.weight"])


@pytest.fixture(scope="module")
def converted():
    wts = make_torch_weights()
    # p3_conv1 must be depthwise: [RED, 1, 3, 3]
    wts["action_p3_conv1.weight"] = torch.randn(
        RED, 1, 3, 3, generator=torch.Generator().manual_seed(1)) * 0.2

    model = ActionConv(features=OUT, n_segment=T, shift_div=8, bn_frozen=True)
    x = jnp.zeros((N * T, H, W, C), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    new_vars, missing = convert_state_dict(wts, variables)
    assert missing == [], missing
    return model, new_vars, wts


class TestActionParity:
    def test_forward_matches_torch(self, converted, rng):
        model, variables, wts = converted
        x = rng.standard_normal((N * T, H, W, C)).astype(np.float32)

        got = model.apply(variables, jnp.asarray(x), train=False)
        # torch oracle consumes NCHW
        ref = torch_action_oracle(
            torch.from_numpy(x).permute(0, 3, 1, 2).contiguous(), wts)
        ref = ref.permute(0, 2, 3, 1).numpy()

        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)

    def test_tsm_init_keeps_identity_channels(self):
        """Fresh init: shift taps follow the TSM pattern (action.py:30-36)."""
        model = ActionConv(features=OUT, n_segment=T, shift_div=8)
        x = jnp.zeros((N * T, H, W, C), jnp.float32)
        variables = model.init(jax.random.key(0), x, train=False)
        w = np.asarray(variables["params"]["shift_w"])
        fold = C // 8
        assert np.all(w[2, :fold] == 1)
        assert np.all(w[0, fold:2 * fold] == 1)
        assert np.all(w[1, 2 * fold:] == 1)
        assert w.sum() == C  # exactly one tap per channel

    def test_train_mode_has_mutable_stats(self, converted, rng):
        model, variables, _ = converted
        x = jnp.asarray(rng.standard_normal((N * T, H, W, C)), jnp.float32)
        # bn_frozen=True: even train=True must not touch running stats
        out, mutated = model.apply(variables, x, train=True,
                                   mutable=["batch_stats"])
        old = variables["batch_stats"]["p3_bn1"]["mean"]
        new = mutated["batch_stats"]["p3_bn1"]["mean"]
        np.testing.assert_array_equal(np.asarray(old), np.asarray(new))
