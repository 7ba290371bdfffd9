"""Shape/dtype contract tests for every TSN variant (the analogue of the
reference's ``__main__`` smoke blocks, SURVEY.md §4 item 3) plus converter
name-mapping coverage against hardcoded torchvision key names."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict

from ehgr_tpu.models.torch_import import (_flax_path_to_torch_key,
                                          convert_state_dict)
from ehgr_tpu.models.tsn import TSN, variant

N, T, HW, CLS = 2, 4, 64, 11


def tiny(arch, **kw):
    return variant(arch, num_class=CLS, num_segments=T, temporal="action",
                   **kw)


def init_and_run(model, train=False, rngs_extra=None):
    x = jnp.zeros((N, T, HW, HW, 3), jnp.float32)
    rngs = {"params": jax.random.key(0)}
    variables = model.init(rngs, x, train=False)
    rngs_apply = {"dropout": jax.random.key(1)} if train else {}
    if train:
        out, _ = model.apply(variables, x, train=True,
                             mutable=["batch_stats"], rngs=rngs_apply)
    else:
        out = model.apply(variables, x, train=False)
    return out, variables


class TestVariants:
    def test_tsn_logits(self):
        out, _ = init_and_run(tiny("tsn"))
        assert out.shape == (N, CLS)
        assert out.dtype == jnp.float32

    def test_tsn_mtmm_tuple(self):
        (logits, depth), _ = init_and_run(tiny("tsn_mtmm"))
        assert logits.shape == (N, CLS)
        # layer4 at 64^2 input is 2x2 -> 3 nearest x2 upsamples -> 16x16
        assert depth.shape == (N * T, 16, 16, 1)
        assert float(depth.min()) >= 0 and float(depth.max()) <= 1  # sigmoid

    def test_tsn_sd_eight_tuple(self):
        out, _ = init_and_run(tiny("tsn_sd"))
        output, m1, m2, m3, ffea, f1, f2, f3 = out
        for o in (output, m1, m2, m3):
            assert o.shape == (N, CLS)
        for f in (ffea, f1, f2, f3):
            assert f.shape == (N * T, 2048)

    def test_tsn_mtmm_sd_rgb_depth(self):
        """modal 'rgb_depth': 8 SD outputs + local (stem x4 = input res) +
        global (layer4 x8) transposed-decoder depths
        (models_MTMM_SD.py:519-521)."""
        out, _ = init_and_run(tiny("tsn_mtmm_sd"))
        assert len(out) == 10
        assert out[8].shape == (N * T, HW, HW, 1)           # local depth
        assert out[9].shape == (N * T, 16, 16, 1)  # global: layer4(2) x8

    def test_tsn_mtmm_sd_full_modal(self):
        """modal 'rgb_depth_skeleton_text': + 42-ch skeleton maps + text
        embedding (models_MTMM_SD.py:531-532)."""
        model = variant("tsn_mtmm_sd", num_class=CLS, num_segments=T,
                        temporal="action", modal="rgb_depth_skeleton_text")
        out, _ = init_and_run(model)
        assert len(out) == 13
        assert out[10].shape == (N * T, HW, HW, 42)         # local skel
        assert out[11].shape == (N * T, 16, 16, 42)         # global skel
        assert out[12].shape == (N, 512)                    # text

    @pytest.mark.parametrize("k", [1, 2, 3])
    def test_middle_deploy_matches_sd_exit(self, k):
        """TSN_MiddleK with SD weights reproduces the SD model's exit K
        (the deployment contract, models_SD.py:434-1232)."""
        sd = tiny("tsn_sd")
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (N, T, HW, HW, 3)), jnp.float32)
        sd_vars = sd.init({"params": jax.random.key(0)}, x, train=False)
        sd_out = sd.apply(sd_vars, x, train=False)

        mid = tiny(f"tsn_middle{k}")
        mid_vars = mid.init({"params": jax.random.key(1)}, x, train=False)
        # graft shared subtree from the SD tree (same module names)
        flat_sd = flatten_dict(sd_vars)
        flat_mid = flatten_dict(mid_vars)
        grafted = {p: flat_sd[p] for p in flat_mid}
        out = mid.apply(unflatten_dict(grafted), x, train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(sd_out[k]),
                                   rtol=1e-5, atol=1e-5)

    def test_train_mode_updates_only_stem_bn(self):
        """Partial-BN: only the stem BN's running stats move in train mode
        (models_MTMM.py:159-175)."""
        model = tiny("tsn")
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (N, T, HW, HW, 3)), jnp.float32)
        variables = model.init({"params": jax.random.key(0)}, x, train=False)
        _, mutated = model.apply(
            variables, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1)})
        old = flatten_dict(variables["batch_stats"])
        new = flatten_dict(mutated["batch_stats"])
        for path in old:
            changed = not np.allclose(np.asarray(old[path]),
                                      np.asarray(new[path]))
            is_stem = path[:2] == ("base_model", "bn1")
            assert changed == is_stem, (path, changed)

    def test_bf16_compute_f32_out(self):
        model = variant("tsn", num_class=CLS, num_segments=T,
                        dtype=jnp.bfloat16)
        out, variables = init_and_run(model)
        assert out.dtype == jnp.float32
        leaves = jax.tree.leaves(variables["params"])
        assert all(l.dtype == jnp.float32 for l in leaves)  # master params f32


def torchvision_resnet50_keys():
    """Hardcoded torchvision ResNet-50 state_dict names + shapes (the
    ImageNet-weights contract, models_MTMM.py:112-114)."""
    keys = {"conv1.weight": (64, 3, 7, 7)}
    for s in ("weight", "bias", "running_mean", "running_var"):
        keys[f"bn1.{s}"] = (64,)
    stages = [(1, 3, 64), (2, 4, 128), (3, 6, 256), (4, 3, 512)]
    in_c = 64
    for stage, blocks, planes in stages:
        for j in range(blocks):
            pre = f"layer{stage}.{j}"
            keys[f"{pre}.conv1.weight"] = (planes, in_c if j == 0 else planes * 4, 1, 1)
            keys[f"{pre}.conv2.weight"] = (planes, planes, 3, 3)
            keys[f"{pre}.conv3.weight"] = (planes * 4, planes, 1, 1)
            for b in (1, 2, 3):
                c = planes * 4 if b == 3 else planes
                for s in ("weight", "bias", "running_mean", "running_var"):
                    keys[f"{pre}.bn{b}.{s}"] = (c,)
            if j == 0:
                keys[f"{pre}.downsample.0.weight"] = (
                    planes * 4, in_c, 1, 1)
                for s in ("weight", "bias", "running_mean", "running_var"):
                    keys[f"{pre}.downsample.1.{s}"] = (planes * 4,)
        in_c = planes * 4
    keys["fc.weight"] = (1000, 2048)
    keys["fc.bias"] = (1000,)
    return keys


class TestTorchImport:
    def test_torchvision_names_cover_plain_resnet(self):
        """Every flax leaf of a plain (no-temporal) TSN backbone resolves to a
        real torchvision key; only the new head stays fresh."""
        model = variant("tsn", num_class=CLS, num_segments=T, temporal="none")
        x = jnp.zeros((1, T, 64, 64, 3), jnp.float32)
        variables = model.init({"params": jax.random.key(0)}, x, train=False)

        g = torch.Generator().manual_seed(0)
        sd = {k: torch.randn(*shape, generator=g) * 0.05
              for k, shape in torchvision_resnet50_keys().items()}
        new_vars, missing = convert_state_dict(sd, variables,
                                               add_base_prefix=True)
        assert sorted(missing) == ["new_fc.bias", "new_fc.weight"], missing

        # spot-check a transpose: conv1 kernel HWIO
        k = new_vars["params"]["base_model"]["conv1"]["kernel"]
        np.testing.assert_allclose(
            np.asarray(k),
            sd["conv1.weight"].numpy().transpose(2, 3, 1, 0))

    def test_reference_key_goldens(self):
        """Name-mapping goldens for decoder / scala / action paths
        (structures from models_MTMM.py:129-155, models_SD.py:84-253)."""
        cases = {
            ("params", "base_model", "layer1_0", "conv1", "net", "kernel"):
                "base_model.layer1.0.conv1.net.weight",
            ("params", "base_model", "layer1_0", "conv1", "shift_w"):
                "base_model.layer1.0.conv1.action_shift.weight",
            ("params", "base_model", "layer3_5", "conv1", "p3_bn1", "scale"):
                "base_model.layer3.5.conv1.action_p3_bn1.weight",
            ("batch_stats", "base_model", "layer2_0", "downsample_bn", "mean"):
                "base_model.layer2.0.downsample.1.running_mean",
            ("params", "global_decoder", "conv0", "kernel"):
                "global_decoder.0.weight",
            ("params", "global_decoder", "bn3", "bias"):
                "global_decoder.13.bias",
            ("params", "global_decoder", "conv4", "bias"):
                "global_decoder.15.bias",
            ("params", "scala1", "sep2", "pw2", "kernel"):
                "scala1.2.op.5.weight",
            ("batch_stats", "scala3", "sep0", "bn2", "var"):
                "scala3.0.op.6.running_var",
            ("params", "middle_fc2", "kernel"): "middle_fc2.weight",
            ("params", "new_fc", "bias"): "new_fc.bias",
            # transposed (MTMM+SD) decoder family, models_MTMM_SD.py:227-266
            ("params", "local_decoder", "ct0", "kernel"):
                "local_decoder.0.weight",
            ("params", "local_decoder", "ctbn0", "scale"):
                "local_decoder.1.weight",
            ("params", "global_decoder", "ct2", "bias"):
                "global_decoder.4.bias",
            ("params", "global_decoder", "ctbn1", "scale"):
                "global_decoder.3.weight",
            ("batch_stats", "global_skel_decoder", "ctbn0", "var"):
                "global_skel_decoder.1.running_var",
            ("params", "text_encoder", "conv", "bias"):
                "text_encoder.0.bias",
            ("params", "text_encoder", "bn", "scale"):
                "text_encoder.1.weight",
        }
        for path, want in cases.items():
            assert _flax_path_to_torch_key(path[1:]) == want, path


class TestTemporalPoolAndSoftmax:
    def test_temporal_pool_halves_segments(self):
        model = TSN(num_class=CLS, num_segments=T, temporal="action",
                    partial_bn=False, temporal_pool=True)
        x = jnp.zeros((N, T, HW, HW, 3), jnp.float32)
        v = model.init({"params": jax.random.key(0)}, x, train=False)
        out = model.apply(v, x, train=False)
        assert out.shape == (N, CLS)  # consensus over T/2 still per-video

    def test_before_softmax_false_averages_probs(self):
        model = TSN(num_class=CLS, num_segments=T, temporal="none",
                    partial_bn=False, before_softmax=False, dropout=0.0)
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (N, T, HW, HW, 3)), jnp.float32)
        v = model.init({"params": jax.random.key(0)}, x, train=False)
        out = model.apply(v, x, train=False)
        # per-segment softmaxes averaged -> rows sum to 1
        np.testing.assert_allclose(np.asarray(out).sum(axis=1), 1.0,
                                   rtol=1e-5)
