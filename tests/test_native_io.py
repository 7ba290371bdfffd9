"""Native IO parity: C++ decode/resample/crop vs the PIL reference path.

The contract is BIT-EXACTNESS: the C++ resample replicates Pillow's
fixed-point bilinear (Resample.c) and the decoders share libjpeg/libpng
with PIL, so every factory transform chain must produce identical arrays
through either backend given identically seeded rngs.
"""

import os

import numpy as np
import pytest
from PIL import Image

from ehgr_tpu.data import native_io
from ehgr_tpu.ops import spatial_transforms as st

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native io toolchain unavailable")


@pytest.fixture
def frames(tmp_path, rng):
    """8 deterministic RGB JPEG frames + matching gray PNGs, 64x48."""
    paths, gray = [], []
    for i in range(8):
        a = rng.integers(0, 256, (48, 64, 3), np.uint8)
        p = str(tmp_path / f"f{i:03d}.jpg")
        Image.fromarray(a).save(p, quality=90)
        paths.append(p)
        g = rng.integers(0, 256, (48, 64), np.uint8)
        gp = str(tmp_path / f"g{i:03d}.png")
        Image.fromarray(g, "L").save(gp)
        gray.append(gp)
    return paths, gray


def _pil_decode(paths, mode, transform):
    imgs = [Image.open(p).convert(mode) for p in paths]
    if transform is not None:
        imgs = transform(imgs)
    out = []
    for im in imgs:
        a = np.asarray(im)
        if a.ndim == 2:
            a = a[:, :, None]
        out.append(a)
    return np.stack(out, 0)


class TestDecode:
    def test_jpeg_rgb_exact(self, frames):
        paths, _ = frames
        for p in paths[:3]:
            want = np.asarray(Image.open(p).convert("RGB"))
            got = native_io.decode_image(p)
            np.testing.assert_array_equal(got, want)

    def test_png_gray_exact(self, frames):
        _, gray = frames
        for p in gray[:3]:
            want = np.asarray(Image.open(p).convert("L"))
            got = native_io.decode_image(p, gray=True)
            np.testing.assert_array_equal(got[..., 0], want)

    def test_rgb_to_gray_matches_pil_convert(self, frames):
        paths, _ = frames
        p = paths[0]
        want = np.asarray(Image.open(p).convert("L"))
        got = native_io.decode_image(p, gray=True)
        np.testing.assert_array_equal(got[..., 0], want)

    def test_gray_to_rgb_replicates(self, frames):
        _, gray = frames
        p = gray[0]
        want = np.asarray(Image.open(p).convert("RGB"))
        got = native_io.decode_image(p)
        np.testing.assert_array_equal(got, want)

    def test_image_size_probe(self, frames):
        paths, gray = frames
        assert native_io.image_size(paths[0]) == (64, 48)
        assert native_io.image_size(gray[0]) == (64, 48)


class TestResample:
    @pytest.mark.parametrize("size", [(32, 24), (128, 96), (57, 31), (224, 224)])
    def test_resize_bit_exact_vs_pil(self, frames, size):
        """Down, up, odd, and protocol-size resizes all bit-match Pillow's
        fixed-point bilinear."""
        _, gray = frames
        p = gray[0]          # PNG: decoder-identical source on both paths
        want = np.asarray(Image.open(p).convert("RGB").resize(
            size, Image.BILINEAR))
        got = native_io.decode_image(p, size=size)
        np.testing.assert_array_equal(got, want)

    def test_resize_gray(self, frames):
        _, gray = frames
        want = np.asarray(Image.open(gray[1]).convert("L").resize(
            (30, 20), Image.BILINEAR))
        got = native_io.decode_image(gray[1], size=(30, 20), gray=True)
        np.testing.assert_array_equal(got[..., 0], want)


def _chain_cases():
    # (name, transform factory taking an rng, mode) covering every chain
    # data/factory.py builds
    return [
        ("train_ego", lambda r: st.Compose(
            [st.GroupScale([56, 56]),
             st.GroupMultiScaleCrop([48, 48], rng=r)]), "RGB"),
        ("train_nv", lambda r: st.Compose(
            [st.GroupScale(56), st.GroupMultiScaleCrop(48, rng=r)]), "RGB"),
        ("eval_center", lambda r: st.Compose(
            [st.GroupScale(56), st.GroupCenterCrop(48)]), "RGB"),
        ("eval_scale_only", lambda r: st.Compose(
            [st.GroupScale([48, 48])]), "RGB"),
        ("random_crop_flip", lambda r: st.Compose(
            [st.GroupScale([56, 56]), st.GroupRandomCrop(48, rng=r),
             st.GroupRandomHorizontalFlip(rng=r)]), "RGB"),
        ("crop3", lambda r: st.GroupFullResSample(32, 56, flip=False), "RGB"),
        ("crop10", lambda r: st.GroupOverSample(32, 56, flip=False), "RGB"),
        ("crop3_flip", lambda r: st.GroupFullResSample(32, 56, flip=True),
         "RGB"),
        ("depth_train", lambda r: st.Compose(
            [st.GroupScale([56, 56]),
             st.GroupMultiScaleCrop([48, 48], rng=r)]), "L"),
    ]


class TestChainParity:
    @pytest.mark.parametrize("name,mk,mode",
                             _chain_cases(), ids=[c[0] for c in _chain_cases()])
    def test_chain_bit_exact(self, frames, name, mk, mode):
        paths, gray = frames
        src = gray if mode == "L" else paths
        idx = np.arange(len(src))
        want = _pil_decode(src, mode, mk(np.random.default_rng(7)))
        got = native_io.decode_clip(src, idx, mode,
                                    mk(np.random.default_rng(7)))
        assert got.shape == want.shape, name
        np.testing.assert_array_equal(got, want)

    def test_seeded_rng_streams_stay_aligned(self, frames):
        """Planner consumes rng exactly like PIL __call__: interleaving
        clips through both backends with one shared seed pair matches."""
        paths, _ = frames
        idx = np.arange(len(paths))
        r1, r2 = np.random.default_rng(3), np.random.default_rng(3)
        t1 = st.Compose([st.GroupScale([56, 56]),
                         st.GroupMultiScaleCrop([48, 48], rng=r1)])
        t2 = st.Compose([st.GroupScale([56, 56]),
                         st.GroupMultiScaleCrop([48, 48], rng=r2)])
        for _ in range(4):
            np.testing.assert_array_equal(
                native_io.decode_clip(paths, idx, "RGB", t2),
                _pil_decode(paths, "RGB", t1))

    def test_fast_mode_same_geometry_close_pixels(self, tmp_path, rng):
        """DCT-scaled decode: identical shapes/geometry, pixels near the
        exact path (big smooth image downscaled >=2x)."""
        yy, xx = np.mgrid[0:256, 0:320]
        a = np.stack([(yy * 255 / 256), (xx * 255 / 320),
                      ((yy + xx) * 255 / 576)], -1).astype(np.uint8)
        p = str(tmp_path / "smooth.jpg")
        Image.fromarray(a).save(p, quality=95)
        t = st.Compose([st.GroupScale([64, 64])])
        exact = native_io.decode_clip([p], np.zeros(4, np.int64), "RGB", t)
        fast = native_io.decode_clip([p], np.zeros(4, np.int64), "RGB", t,
                                     fast=True)
        assert exact.shape == fast.shape
        diff = np.abs(exact.astype(np.int32) - fast.astype(np.int32))
        assert diff.mean() < 2.0 and diff.max() <= 32

    def test_unsupported_chain_raises(self, frames):
        paths, _ = frames
        with pytest.raises(native_io.UnsupportedChain):
            native_io.plan_clip(
                st.Compose([st.GroupRandomHorizontalFlip(is_flow=True)]),
                64, 48)


class TestDatasetIntegration:
    def test_dataset_native_backend_matches_pil(self, tmp_path, rng):
        """SDDataset with decode_backend='native' reproduces the PIL
        backend bit-exactly on a synthetic EgoGesture tree."""
        from ehgr_tpu.data.annotations import construct_annot_ego
        from ehgr_tpu.data.datasets import SDDataset
        from ehgr_tpu.data.synthetic import make_synthetic_ego_tree

        paths = make_synthetic_ego_tree(str(tmp_path), size=(64, 48),
                                        num_classes=3, frames_per_gesture=12)
        annot = tmp_path / "annot"
        annot.mkdir()
        for m in ("train", "val"):
            construct_annot_ego(paths["frame_path"], paths["label_path"],
                                str(annot), m)

        def mk(backend):
            t = st.Compose([
                st.GroupScale([56, 56]),
                st.GroupMultiScaleCrop([48, 48],
                                       rng=np.random.default_rng(11))])
            return SDDataset(str(annot), "train", spatial_transform=t,
                             temporal_transform="uniform_train", clip_len=4,
                             seed=5, decode_backend=backend)

        a, b = mk("pil"), mk("native")
        for i in range(min(4, len(a))):
            sa, sb = a[i], b[i]
            np.testing.assert_array_equal(sa["rgb"], sb["rgb"])
            assert sa["label"] == sb["label"]
