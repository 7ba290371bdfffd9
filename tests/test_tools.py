"""Tool-layer tests: GradCAM, case-study export, modality adapters,
10-class subset splits, pseudo-depth tree generation."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ehgr_tpu.eval.gradcam import gradcam, overlay_cam
from ehgr_tpu.models.modality import adapt_first_conv, rgb_diff, stack_flow
from ehgr_tpu.models.tsn import variant

N, T, HW, CLS = 1, 4, 64, 5


@pytest.fixture(scope="module")
def tsn_and_vars():
    model = variant("tsn", num_class=CLS, num_segments=T, temporal="action",
                    partial_bn=False)
    x = jnp.zeros((N, T, HW, HW, 3), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    return model, variables


class TestGradCAM:
    def test_final_cam_shape_and_range(self, tsn_and_vars, rng):
        model, variables = tsn_and_vars
        clip = jnp.asarray(rng.standard_normal((N, T, HW, HW, 3)),
                           jnp.float32)
        cams, logits = gradcam(model, variables, clip)
        assert cams.shape == (N * T, 2, 2)        # layer4 at 64^2
        assert logits.shape == (N, CLS)
        assert cams.min() >= 0 and cams.max() <= 1

    def test_mid_exit_cam(self, rng):
        model = variant("tsn_sd", num_class=CLS, num_segments=T,
                        temporal="action", partial_bn=False)
        x = jnp.zeros((N, T, HW, HW, 3), jnp.float32)
        variables = model.init({"params": jax.random.key(0)}, x, train=False)
        clip = jnp.asarray(rng.standard_normal((N, T, HW, HW, 3)),
                           jnp.float32)
        cams, logits = gradcam(model, variables, clip, exit="mid1")
        assert cams.shape == (N * T, 16, 16)      # layer1 at 64^2
        assert logits.shape == (N, CLS)

    def test_overlay(self, rng):
        frame = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        cam = rng.random((2, 2)).astype(np.float32)
        out = overlay_cam(frame, cam)
        assert out.shape == frame.shape and out.dtype == np.uint8


class TestCaseStudy:
    def test_export(self, tsn_and_vars, tmp_path, rng):
        from ehgr_tpu.data.synthetic import SyntheticClipSource
        from ehgr_tpu.eval.case_study import export_case_study

        model, variables = tsn_and_vars
        ds = SyntheticClipSource(n_videos=3, clip_len=T, size=(HW, HW),
                                 num_classes=CLS, clip_num=2)
        manifest = export_case_study(model, variables, ds, str(tmp_path),
                                     max_videos=2)
        assert len(manifest) == 2
        assert all(os.path.isfile(m["gif"]) for m in manifest)


class TestModality:
    def test_adapt_first_conv_flow(self, tsn_and_vars):
        _, variables = tsn_and_vars
        new = adapt_first_conv(variables["params"], 10)
        k = new["base_model"]["conv1"]["kernel"]
        assert k.shape[2] == 10
        orig = variables["params"]["base_model"]["conv1"]["kernel"]
        np.testing.assert_allclose(np.asarray(k[..., 0, :]),
                                   np.asarray(orig).mean(axis=2), rtol=1e-6)

    def test_adapt_keep_rgb(self, tsn_and_vars):
        _, variables = tsn_and_vars
        new = adapt_first_conv(variables["params"], 9, keep_rgb=True)
        k = new["base_model"]["conv1"]["kernel"]
        orig = variables["params"]["base_model"]["conv1"]["kernel"]
        np.testing.assert_array_equal(np.asarray(k[..., :3, :]),
                                      np.asarray(orig))

    def test_rgb_diff(self, rng):
        clip = jnp.asarray(rng.standard_normal((2, 4, 8, 8, 3)), jnp.float32)
        d = rgb_diff(clip)
        assert d.shape == (2, 3, 8, 8, 3)
        both = rgb_diff(clip, keep_rgb=True)
        assert both.shape == (2, 3, 8, 8, 6)

    def test_stack_flow(self, rng):
        u = jnp.zeros((1, 4, 8, 8))
        assert stack_flow(u, u).shape == (1, 4, 8, 8, 2)

    def test_flow_model_runs(self, rng):
        """A TSN accepts non-RGB channel widths natively (Flow = 2ch)."""
        model = variant("tsn", num_class=CLS, num_segments=T,
                        temporal="action", partial_bn=False)
        x = jnp.asarray(rng.standard_normal((N, T, 32, 32, 2)), jnp.float32)
        v = model.init({"params": jax.random.key(0)}, x, train=False)
        assert model.apply(v, x, train=False).shape == (N, CLS)


class TestSubsets:
    def test_10cls_splits(self, tmp_path):
        import pandas as pd

        from ehgr_tpu.data.annotations import make_10cls_splits

        df = pd.DataFrame({
            "rgb": [[f"f{i}.jpg"] for i in range(30)],
            "depth": [[f"d{i}.jpg"] for i in range(30)],
            "depth_est": [[f"e{i}.jpg"] for i in range(30)],
            "label": list(range(15)) * 2,
        })
        df.to_pickle(tmp_path / "train_plus_val.pkl")
        df.to_pickle(tmp_path / "test.pkl")
        p1, p2 = make_10cls_splits(str(tmp_path))
        sub = pd.read_pickle(p1)
        assert set(sub["label"]) == set(range(10))
        assert len(sub) == 20


class TestPseudoDepth:
    def test_tree_generation(self, tmp_path, rng):
        from PIL import Image

        from ehgr_tpu.data.pseudo_depth import generate_pseudo_depth_tree

        rgb_dir = tmp_path / "Subject01" / "Scene1" / "Color" / "rgb1"
        rgb_dir.mkdir(parents=True)
        for i in range(3):
            Image.fromarray(rng.integers(0, 256, (16, 16, 3),
                                         dtype=np.uint8)).save(
                rgb_dir / f"{i:06}.jpg")
        n = generate_pseudo_depth_tree(str(tmp_path), str(tmp_path))
        assert n == 3
        out = tmp_path / "Subject01" / "Scene1" / "Depth_Est" / "depth_est1"
        assert len(list(out.glob("*.jpg"))) == 3

    def test_root_containing_rgb_substring(self, tmp_path, rng):
        """Regression: a root whose own path contains 'rgb'/'Color' (e.g. a
        pytest tmpdir named after an rgb_* test) must not corrupt output
        paths — substitution is per component below the root."""
        from PIL import Image

        from ehgr_tpu.data.pseudo_depth import generate_pseudo_depth_tree

        root = tmp_path / "my_rgb_Color_experiment" / "frames"
        rgb_dir = root / "Subject01" / "Scene1" / "Color" / "rgb1"
        rgb_dir.mkdir(parents=True)
        for i in range(2):
            Image.fromarray(rng.integers(0, 256, (16, 16, 3),
                                         dtype=np.uint8)).save(
                rgb_dir / f"{i:06}.jpg")
        n = generate_pseudo_depth_tree(str(root), str(root))
        assert n == 2
        out = root / "Subject01" / "Scene1" / "Depth_Est" / "depth_est1"
        assert len(list(out.glob("*.jpg"))) == 2

    def test_separate_out_root(self, tmp_path, rng):
        """out_root is honored (it was silently ignored before)."""
        from PIL import Image

        from ehgr_tpu.data.pseudo_depth import generate_pseudo_depth_tree

        src = tmp_path / "src"
        dst = tmp_path / "dst"
        rgb_dir = src / "Subject01" / "Scene1" / "Color" / "rgb1"
        rgb_dir.mkdir(parents=True)
        Image.fromarray(rng.integers(0, 256, (16, 16, 3),
                                     dtype=np.uint8)).save(
            rgb_dir / "000001.jpg")
        assert generate_pseudo_depth_tree(str(src), str(dst)) == 1
        assert (dst / "Subject01" / "Scene1" / "Depth_Est" / "depth_est1"
                / "000001.jpg").exists()

    def test_midas_gated(self):
        from ehgr_tpu.data.pseudo_depth import midas_predictor

        with pytest.raises(RuntimeError, match="MiDaS"):
            midas_predictor()
