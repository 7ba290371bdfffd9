"""Group spatial-transform tests: shapes, crop geometry, PIL parity hooks."""

import numpy as np
import pytest
from PIL import Image

from ehgr_tpu.ops import spatial_transforms as st


def make_clip(t=4, h=120, w=160, mode="RGB", seed=0):
    rng = np.random.default_rng(seed)
    frames = []
    for _ in range(t):
        if mode == "RGB":
            a = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        else:
            a = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        frames.append(Image.fromarray(a, mode=mode))
    return frames


class TestGroupScale:
    def test_square_resize(self):
        out = st.GroupScale([224, 224])(make_clip())
        assert all(img.size == (224, 224) for img in out)

    def test_short_side_resize(self):
        out = st.GroupScale(256)(make_clip(h=120, w=160))
        # short side 120 -> 256; 160 -> 341 (aspect kept)
        assert all(img.size == (341, 256) for img in out)

    def test_matches_pil_bilinear(self):
        clip = make_clip(t=1)
        ours = np.asarray(st.GroupScale([64, 64])(clip)[0])
        ref = np.asarray(clip[0].resize((64, 64), Image.BILINEAR))
        np.testing.assert_array_equal(ours, ref)


class TestCrops:
    def test_center_crop_geometry(self):
        clip = make_clip(h=256, w=256)
        out = st.GroupCenterCrop(224)(clip)
        assert all(img.size == (224, 224) for img in out)
        ref = np.asarray(clip[0])[16:240, 16:240]
        np.testing.assert_array_equal(np.asarray(out[0]), ref)

    def test_random_crop_consistent_across_clip(self, rng):
        clip = make_clip(h=256, w=256)
        out = st.GroupRandomCrop(224, rng=rng)(clip)
        base = np.asarray(clip[0])
        got = np.asarray(out[0])
        # locate offset by matching top-left pixel rows; all frames share it
        assert all(img.size == (224, 224) for img in out)
        found = False
        for y in range(33):
            for x in range(33):
                if np.array_equal(base[y:y + 224, x:x + 224], got):
                    found = True
                    # every frame uses the same offset
                    for i, img in enumerate(out):
                        np.testing.assert_array_equal(
                            np.asarray(img),
                            np.asarray(clip[i])[y:y + 224, x:x + 224])
                    break
            if found:
                break
        assert found

    def test_flip(self):
        clip = make_clip()
        out = st.GroupRandomHorizontalFlip(
            rng=np.random.default_rng(1))(clip)  # first draw of rng(1) < .5 ?
        # whichever way the coin lands, output must be frames or their mirror
        a0, b0 = np.asarray(clip[0]), np.asarray(out[0])
        assert np.array_equal(a0, b0) or np.array_equal(a0[:, ::-1], b0)


class TestMultiScaleCrop:
    def test_output_size_and_determinism(self):
        clip = make_clip(h=224, w=224)
        t = st.GroupMultiScaleCrop([224, 224], rng=np.random.default_rng(3))
        out = t(clip)
        assert all(img.size == (224, 224) for img in out)

    def test_offsets_grid(self):
        offs = st.fill_fix_offset(True, 256, 256, 224, 224)
        assert len(offs) == 13
        assert offs[:5] == [(0, 0), (32, 0), (0, 32), (32, 32), (16, 16)]


class TestMultiCropEval:
    def test_full_res_sample_3crop(self):
        clip = make_clip(t=8, h=240, w=320)
        out = st.GroupFullResSample(256, 256, flip=False)(clip)
        assert len(out) == 3 * 8
        assert all(img.size == (256, 256) for img in out)

    def test_oversample_10crop(self):
        clip = make_clip(t=8, h=240, w=320)
        out = st.GroupOverSample(224, 256, flip=True)(clip)
        assert len(out) == 10 * 8
        assert all(img.size == (224, 224) for img in out)


class TestToClipArray:
    def test_rgb_shape_range(self):
        clip = make_clip(t=4, h=64, w=64)
        arr = st.ToClipArray()(clip)
        assert arr.shape == (4, 64, 64, 3)
        assert arr.dtype == np.float32
        assert arr.max() <= 1.0 and arr.min() >= 0.0

    def test_grayscale_gets_channel(self):
        clip = make_clip(t=4, h=64, w=64, mode="L")
        arr = st.ToClipArray()(clip)
        assert arr.shape == (4, 64, 64, 1)

    def test_bgr_roll(self):
        clip = make_clip(t=1, h=8, w=8)
        rgb = st.ToClipArray(div=False)(clip)
        bgr = st.ToClipArray(div=False, roll=True)(clip)
        np.testing.assert_array_equal(rgb[..., ::-1], bgr)

    def test_normalize(self):
        clip = make_clip(t=2, h=8, w=8)
        arr = st.ToClipArray()(clip)
        mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
        normed = st.ClipNormalize(mean, std)(arr)
        ref = (arr - np.array(mean, np.float32)) / np.array(std, np.float32)
        np.testing.assert_allclose(normed, ref, rtol=1e-6)


class TestDevicePreprocess:
    def test_eval_batch_matches_host_math(self):
        import jax.numpy as jnp
        from ehgr_tpu.ops import preprocess_device as pd

        rng = np.random.default_rng(0)
        frames = rng.integers(0, 256, size=(2, 4, 224, 224, 3), dtype=np.uint8)
        out = pd.preprocess_eval_batch(
            jnp.asarray(frames), crop_size=224, dtype_name="float32")
        host = (frames.astype(np.float32) / 255.0
                - np.array(pd.IMAGENET_MEAN, np.float32)) \
            / np.array(pd.IMAGENET_STD, np.float32)
        np.testing.assert_allclose(np.asarray(out), host, rtol=2e-5, atol=2e-5)

    def test_nv_center_crop_path(self):
        import jax.numpy as jnp
        from ehgr_tpu.ops import preprocess_device as pd

        frames = np.zeros((1, 2, 240, 320, 3), dtype=np.uint8)
        out = pd.preprocess_eval_batch(
            jnp.asarray(frames), scale_size=256, crop_size=256,
            square_resize=False, dtype_name="float32")
        assert out.shape == (1, 2, 256, 256, 3)

    def test_depth_target(self):
        import jax.numpy as jnp
        from ehgr_tpu.ops import preprocess_device as pd

        d = np.full((1, 2, 224, 224, 1), 128, dtype=np.uint8)
        out = pd.depth_to_target(jnp.asarray(d), size=56)
        assert out.shape == (1, 2, 56, 56, 1)
        np.testing.assert_allclose(np.asarray(out), 128 / 255.0, rtol=1e-6)

    def test_depth_target_matches_torch_interpolate(self):
        """The reference resizes the depth GT with F.interpolate bilinear
        (no antialias, align_corners=False, train_mtmm.py:226-229); our
        device-side target must match it elementwise, both down- and
        up-sampling."""
        import torch
        import torch.nn.functional as F
        import jax.numpy as jnp
        from ehgr_tpu.ops import preprocess_device as pd

        gen = np.random.default_rng(7)
        for h, size in ((224, 56), (64, 16), (14, 56)):
            d = gen.integers(0, 256, (2, 3, h, h, 1), dtype=np.uint8)
            got = np.asarray(pd.depth_to_target(jnp.asarray(d), size=size))
            t = torch.from_numpy(
                d.astype(np.float32) / 255.0).permute(0, 1, 4, 2, 3)
            want = F.interpolate(t.reshape(6, 1, h, h), size=(size, size),
                                 mode="bilinear")
            want = want.reshape(2, 3, 1, size, size).permute(0, 1, 3, 4, 2)
            np.testing.assert_allclose(got, want.numpy(), rtol=1e-5,
                                       atol=1e-6, err_msg=f"{h}->{size}")


class TestRandomSizedCropAndRotate:
    def test_random_sized_crop(self):
        clip = make_clip(t=3, h=100, w=120)
        out = st.GroupRandomSizedCrop(64, rng=np.random.default_rng(2))(clip)
        assert len(out) == 3
        assert all(img.size == (64, 64) for img in out)

    def test_rotate_consistent(self):
        clip = make_clip(t=3, h=32, w=32)
        out = st.GroupMultiScaleRotate(10, rng=np.random.default_rng(1))(clip)
        assert all(img.size == (32, 32) for img in out)
        # all frames rotated by the same angle: pairwise pixel relation holds
        a = np.asarray(out[0]).astype(int) - np.asarray(clip[0]).astype(int)
        assert len(out) == 3
