"""Int8 inference path: tree compatibility + numeric closeness vs float.

Speed is measured on the real chip (`tools/bench_ablations.py int8`,
`tools/bench_int8.py` — docs/PERF.md); these tests pin the semantics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from ehgr_tpu.models.tsn import variant
from ehgr_tpu.ops.quantize import (QuantConv, quantize_activation,
                                   quantize_weight)


class TestQuantConv:
    def test_param_tree_matches_nn_conv(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
        a = nn.Conv(24, (3, 3), use_bias=False).init(jax.random.key(0), x)
        b = QuantConv(24, (3, 3)).init(jax.random.key(0), x)
        assert jax.tree_util.tree_structure(a) == \
            jax.tree_util.tree_structure(b)
        np.testing.assert_array_equal(np.asarray(a["params"]["kernel"]),
                                      np.asarray(b["params"]["kernel"]))

    def test_float_path_equals_nn_conv(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
        conv = nn.Conv(24, (3, 3), use_bias=False,
                       padding=[(1, 1), (1, 1)], strides=(2, 2))
        v = conv.init(jax.random.key(1), x)
        want = conv.apply(v, x)
        got = QuantConv(24, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)]).apply(v, x, mode="float")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_int8_path_close_to_float(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 64)), jnp.float32)
        q = QuantConv(64, (3, 3))
        v = q.init(jax.random.key(2), x)
        want = np.asarray(q.apply(v, x, mode="float"))
        got = np.asarray(q.apply(v, x, mode="dynamic"))
        # int8 per-channel weights + per-tensor activations: ~1% relative
        err = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-9)
        assert err < 0.02, err
        cos = (got * want).sum() / (np.linalg.norm(got)
                                    * np.linalg.norm(want) + 1e-9)
        assert cos > 0.999, cos

    def test_static_mode_matches_dynamic_after_calibration(self, rng):
        """calib records amax; static with that scale == dynamic on the
        same input (identical per-tensor scale)."""
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 64)), jnp.float32)
        q = QuantConv(64, (3, 3))
        v = jax.tree_util.tree_map(np.asarray, QuantConv(64, (3, 3)).init(
            jax.random.key(3), x, mode="calib"))
        _, upd = q.apply(v, x, mode="calib", mutable=["quant"])
        v = {**v, "quant": upd["quant"]}
        assert float(jax.tree_util.tree_leaves(upd["quant"])[0]) > 0
        got = np.asarray(q.apply(v, x, mode="static"))
        want = np.asarray(q.apply(v, x, mode="dynamic"))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_quantize_helpers_roundtrip(self, rng):
        w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)), jnp.float32)
        wq, ws = quantize_weight(w)
        assert wq.dtype == jnp.int8 and ws.shape == (16,)
        back = np.asarray(wq, np.float32) * np.asarray(ws)
        np.testing.assert_allclose(back, np.asarray(w), atol=float(
            np.abs(w).max()) / 127 + 1e-6)
        xq, xs = quantize_activation(w.reshape(1, 3, 3, -1))
        assert xq.dtype == jnp.int8 and np.abs(np.asarray(xq)).max() <= 127


class TestQuantizedTSN:
    def test_logits_close_and_tree_identical(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 4, 16, 16, 3)), jnp.float32)
        kw = dict(num_class=7, num_segments=4, base_model="resnet50",
                  temporal="action", partial_bn=False)
        base = variant("tsn", **kw)
        quant = variant("tsn", quantize=True, **kw)
        v = base.init(jax.random.key(0), x, train=False)
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
            quant.init(jax.random.key(0), x, train=False))
        want = np.asarray(base.apply(v, x, train=False), np.float32)
        got = np.asarray(quant.apply(v, x, train=False), np.float32)
        # random-init logits are near-zero; compare on scale of the spread
        denom = want.std() + 1e-9
        assert np.abs(got - want).max() / denom < 0.35
        cos = (got * want).sum() / (np.linalg.norm(got)
                                    * np.linalg.norm(want) + 1e-9)
        assert cos > 0.98, cos

    def test_static_tsn_calibrates_and_stays_close(self, rng):
        """quantize='static' end to end: calib records a scale for every
        QuantConv site (36 = 52 block convs minus the 16 ACTION conv1s,
        whose wrapped 1x1 stays float by default — int8 there measured
        474->329 clips/s, docs/PERF.md), and calibrated static logits stay
        close to float."""
        x = jnp.asarray(rng.standard_normal((2, 4, 16, 16, 3)), jnp.float32)
        kw = dict(num_class=7, num_segments=4, base_model="resnet50",
                  temporal="action", partial_bn=False, dropout=0.0)
        base = variant("tsn", **kw)
        calib = variant("tsn", quantize="calib", **kw)
        static = variant("tsn", quantize="static", **kw)
        v = calib.init(jax.random.key(0), x, train=False)
        n_sites = len(jax.tree_util.tree_leaves(v["quant"]))
        assert n_sites == 36, n_sites
        _, upd = calib.apply(v, x, train=False, mutable=["quant"])
        v = {**v, "quant": upd["quant"]}
        assert all(float(s) > 0 for s in
                   jax.tree_util.tree_leaves(v["quant"]))
        want = np.asarray(base.apply(
            {k: v[k] for k in ("params", "batch_stats")}, x, train=False),
            np.float32)
        got = np.asarray(static.apply(v, x, train=False), np.float32)
        cos = (got * want).sum() / (np.linalg.norm(got)
                                    * np.linalg.norm(want) + 1e-9)
        assert cos > 0.98, cos

    def test_action_wrapped_conv_int8_optin(self, rng):
        """The ActionConv-level int8 path (explicit opt-in only) stays
        numerically close after calibration."""
        from ehgr_tpu.ops.action import ActionConv

        x = jnp.asarray(rng.standard_normal((8, 8, 8, 32)), jnp.float32)
        base = ActionConv(16, n_segment=4)
        calib = ActionConv(16, n_segment=4, quantize="calib")
        static = ActionConv(16, n_segment=4, quantize="static")
        v = calib.init(jax.random.key(0), x, train=False)
        _, upd = calib.apply(v, x, train=False, mutable=["quant"])
        v = {**v, "quant": upd["quant"]}
        want = np.asarray(base.apply(
            {k: v[k] for k in v if k != "quant"}, x, train=False))
        got = np.asarray(static.apply(v, x, train=False))
        err = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-9)
        assert err < 0.05, err

    def test_train_path_is_exact_float(self, rng):
        """train=True through the quantized model == the base model (the
        int8 path is inference-only)."""
        x = jnp.asarray(rng.standard_normal((2, 4, 16, 16, 3)), jnp.float32)
        kw = dict(num_class=7, num_segments=4, base_model="resnet50",
                  temporal="none", partial_bn=False, dropout=0.0)
        base = variant("tsn", **kw)
        quant = variant("tsn", quantize=True, **kw)
        v = base.init(jax.random.key(0), x, train=False)
        rngs = {"dropout": jax.random.key(1)}
        want, _ = base.apply(v, x, train=True, mutable=["batch_stats"],
                             rngs=rngs)
        got, _ = quant.apply(v, x, train=True, mutable=["batch_stats"],
                             rngs=rngs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_non_resnet_rejected(self):
        with pytest.raises(ValueError, match="resnet-only"):
            variant("tsn", num_class=7, num_segments=4,
                    base_model="mobilenet_v2", quantize=True).init(
                jax.random.key(0),
                jnp.zeros((1, 4, 16, 16, 3), jnp.float32), train=False)
