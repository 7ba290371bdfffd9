"""Secondary-backbone contract tests: MobileNetV2(+ACTION), BNInception
(+ACTION gates), Res2Net(+ACTION — the wiring the reference lost), plus
converter name goldens for their checkpoints."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ehgr_tpu.models.backbones import get_backbone, supports_taps
from ehgr_tpu.models.torch_import import _flax_path_to_torch_key
from ehgr_tpu.models.tsn import variant

N, T, HW, CLS = 1, 4, 64, 7


def run_backbone(name, temporal):
    bb = get_backbone(name, temporal=temporal, n_segment=T, shift_div=8,
                      partial_bn=False, dtype=jnp.float32)
    x = jnp.zeros((N * T, HW, HW, 3), jnp.float32)
    variables = bb.init({"params": jax.random.key(0)}, x, train=False)
    return bb.apply(variables, x, train=False)


class TestMobileNetV2:
    @pytest.mark.parametrize("temporal", ["none", "action"])
    def test_pool_width(self, temporal):
        taps = run_backbone("mobilenet_v2", temporal)
        assert taps["pool"].shape == (N * T, 1280)
        # 64^2 input: 5 stride-2 stages -> 2x2 final map
        assert taps["final"].shape == (N * T, 2, 2, 1280)

    def test_tsn_variant(self):
        model = variant("tsn", num_class=CLS, num_segments=T,
                        base_model="mobilenet_v2", temporal="action",
                        partial_bn=False)
        x = jnp.zeros((N, T, HW, HW, 3), jnp.float32)
        v = model.init({"params": jax.random.key(0)}, x, train=False)
        out = model.apply(v, x, train=False)
        assert out.shape == (N, CLS)

    def test_action_only_on_res_connected_expand_blocks(self):
        model = variant("tsn", num_class=CLS, num_segments=T,
                        base_model="mobilenet_v2", temporal="action",
                        partial_bn=False)
        x = jnp.zeros((N, T, HW, HW, 3), jnp.float32)
        v = model.init({"params": jax.random.key(0)}, x, train=False)
        feats = v["params"]["base_model"]
        action_blocks = [k for k, sub in feats.items()
                         if isinstance(sub, dict) and "conv_0" in sub
                         and "shift_w" in sub.get("conv_0", {})]
        # setting (t,c,n,s): res-connected blocks are the k>0 repeats with
        # expand!=1: (24 x1), (32 x2), (64 x3), (96 x2+entry), (160 x2), = 10
        assert len(action_blocks) == 10, sorted(action_blocks)

    def test_converter_names(self):
        cases = {
            ("params", "base_model", "features_0", "c0", "kernel"):
                "base_model.features.0.0.weight",
            ("params", "base_model", "features_1", "conv_0", "kernel"):
                "base_model.features.1.conv.0.weight",
            ("batch_stats", "base_model", "features_2", "conv_4", "mean"):
                "base_model.features.2.conv.4.running_mean",
            ("params", "base_model", "features_18", "c1", "scale"):
                "base_model.features.18.1.weight",
        }
        for path, want in cases.items():
            assert _flax_path_to_torch_key(path[1:]) == want, path


class TestBNInception:
    @pytest.mark.parametrize("temporal", ["none", "action", "tsm"])
    def test_pool_width(self, temporal):
        taps = run_backbone("bn_inception", temporal)
        assert taps["pool"].shape == (N * T, 1024)
        # 64^2: /2 conv, /2 pool, /2 pool, /2 (3c), /2 (4e) -> 2x2
        assert taps["final"].shape == (N * T, 2, 2, 1024)

    def test_converter_names(self):
        cases = {
            ("params", "base_model", "conv1", "conv", "kernel"):
                "base_model.conv1_7x7_s2.weight",
            ("params", "base_model", "conv1", "bn", "scale"):
                "base_model.conv1_7x7_s2_bn.weight",
            ("params", "base_model", "conv2_reduce", "conv", "bias"):
                "base_model.conv2_3x3_reduce.bias",
            ("params", "base_model", "inception_3a", "b1x1", "conv",
             "kernel"): "base_model.inception_3a_1x1.weight",
            ("batch_stats", "base_model", "inception_4e", "bd3x3_2", "bn",
             "var"): "base_model.inception_4e_double_3x3_2_bn.running_var",
            ("params", "base_model", "inception_5b", "bpool_proj", "bn",
             "bias"): "base_model.inception_5b_pool_proj_bn.bias",
        }
        for path, want in cases.items():
            assert _flax_path_to_torch_key(path[1:]) == want, path

    def test_sd_rejected(self):
        model = variant("tsn_sd", num_class=CLS, num_segments=T,
                        base_model="bn_inception", partial_bn=False)
        x = jnp.zeros((N, T, HW, HW, 3), jnp.float32)
        with pytest.raises(ValueError, match="plain TSN surface"):
            model.init({"params": jax.random.key(0)}, x, train=False)


class TestRes2Net:
    def test_taps_match_resnet_contract(self):
        taps = run_backbone("res2net50", "action")
        assert taps["layer4"].shape == (N * T, 2, 2, 2048)
        assert taps["pool"].shape == (N * T, 2048)
        assert supports_taps("res2net50")

    def test_sd_variant_works(self):
        """The capability the reference lost: res2net + shift + SD exits."""
        model = variant("tsn_sd", num_class=CLS, num_segments=T,
                        base_model="res2net50", temporal="action",
                        partial_bn=False)
        x = jnp.zeros((N, T, HW, HW, 3), jnp.float32)
        v = model.init({"params": jax.random.key(0)}, x, train=False)
        out = model.apply(v, x, train=False)
        assert len(out) == 8 and out[0].shape == (N, CLS)
