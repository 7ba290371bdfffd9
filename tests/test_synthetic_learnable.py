"""LearnableClipSource: the end-to-end learnability proxy task.

The label is a deterministic function of clip content (motion direction +
patch color), so a correct train/eval pipeline can reach high accuracy on
it — the strongest accuracy-parity proxy available without the real
datasets (VERDICT r3 #2; reference dynamics ``train_sd.py:262-282``).
These tests pin the data-side contract; the chip-run proof lives in
``cli/dress_rehearsal.py --learnable`` (committed record under ``runs/``).
"""

import numpy as np
import pytest

from ehgr_tpu.configs import Config, DataConfig, ModelConfig, RunConfig
from ehgr_tpu.data.factory import build_test_dataset, build_train_datasets
from ehgr_tpu.data.synthetic import _DIRS, LearnableClipSource


def _centroid(depth_frame):
    ys, xs = np.where(depth_frame[:, :, 0] > 150)
    return np.array([ys.mean(), xs.mean()])


class TestLearnableClips:
    def test_motion_matches_label(self):
        src = LearnableClipSource(
            n_videos=32, clip_len=8, size=(64, 64), num_classes=16,
            fields=("rgb", "depth", "n_depth", "label"), seed=0)
        for idx in range(16):
            item = src[idx]
            lab = int(item["label"])
            assert lab == idx % 16  # balanced round-robin labels
            cents = np.array([_centroid(item["depth"][t]) for t in range(8)])
            d_obs = np.diff(cents, axis=0).mean(0)
            d_true = _DIRS[lab % src.n_dirs] * src.vel
            np.testing.assert_allclose(d_obs, d_true, atol=0.5)

    def test_n_depth_leads_depth_one_step(self):
        """next-segment semantics: n_depth[t] == patch position at t+1
        (reference contract ``data/dataset_EgoGesture.py:190-192``)."""
        src = LearnableClipSource(
            n_videos=8, clip_len=8, size=(64, 64), num_classes=8,
            fields=("rgb", "depth", "n_depth", "label"), seed=3)
        item = src[5]
        for t in range(7):
            np.testing.assert_array_equal(item["n_depth"][t],
                                          item["depth"][t + 1])

    def test_color_encodes_high_label_bits(self):
        src = LearnableClipSource(
            n_videos=32, clip_len=4, size=(48, 48), num_classes=16,
            fields=("rgb", "depth", "label"), seed=1)
        colors = {}
        for idx in range(16):
            item = src[idx]
            mask = item["depth"][0][:, :, 0] > 150
            patch_rgb = item["rgb"][0][mask].mean(0)
            colors.setdefault(int(item["label"]) // 8, []).append(patch_rgb)
        c0 = np.mean(colors[0], axis=0)
        c1 = np.mean(colors[1], axis=0)
        assert np.abs(c0 - c1).max() > 100  # the two colors are far apart

    def test_deterministic_and_distinct(self):
        src = LearnableClipSource(n_videos=8, clip_len=4, size=(32, 32),
                                  num_classes=8, fields=("rgb", "label"),
                                  seed=0)
        a, b = src[2], src[2]
        np.testing.assert_array_equal(a["rgb"], b["rgb"])
        c = src[3]
        assert not np.array_equal(a["rgb"], c["rgb"])

    def test_trajectory_stays_in_frame(self):
        """No patch pixel may leave the frame for any direction/seed —
        otherwise direction becomes ambiguous at the edge."""
        src = LearnableClipSource(
            n_videos=64, clip_len=8, size=(40, 56), num_classes=8,
            fields=("rgb", "depth", "n_depth", "label"), seed=9)
        p2 = src.patch * src.patch
        for idx in range(64):
            item = src[idx]
            for t in range(8):
                assert (item["depth"][t][:, :, 0] > 150).sum() == p2
                assert (item["n_depth"][t][:, :, 0] > 150).sum() == p2

    def test_clip_num_same_label_different_starts(self):
        src = LearnableClipSource(n_videos=4, clip_len=8, size=(64, 64),
                                  num_classes=16, fields=("rgb", "label"),
                                  seed=7, clip_num=4)
        item = src[1]
        assert item["rgb"].shape == (4, 8, 64, 64, 3)
        assert not np.array_equal(item["rgb"][0], item["rgb"][1])


class TestHardMotionClips:
    """motion_hard: white target among colored distractors, dir x speed
    labels (VERDICT r4 next #1 — the discriminative exit-ladder task)."""

    def _src(self, **kw):
        kw.setdefault("n_videos", 32)
        kw.setdefault("clip_len", 8)
        kw.setdefault("size", (64, 64))
        kw.setdefault("num_classes", 16)
        kw.setdefault("fields", ("rgb", "depth", "n_depth", "label"))
        kw.setdefault("seed", 0)
        return LearnableClipSource(hard=True, **kw)

    def test_target_motion_matches_label(self):
        src = self._src()
        for idx in range(16):
            item = src[idx]
            lab = int(item["label"])
            cents = np.array([_centroid(item["depth"][t]) for t in range(8)])
            d_obs = np.diff(cents, axis=0).mean(0)
            vel = src.speeds[lab // src.n_dirs]
            d_true = _DIRS[lab % src.n_dirs] * vel
            np.testing.assert_allclose(d_obs, d_true, atol=0.5)

    def test_target_is_achromatic_distractors_are_not(self):
        src = self._src(seed=2)
        saw_distractor = False
        for idx in range(8):
            item = src[idx]
            mask = item["depth"][0][:, :, 0] > 150
            tgt = item["rgb"][0][mask].astype(np.int32)
            # target: R=G=B per pixel (brightness-jittered white)
            assert (tgt.max(1) - tgt.min(1)).max() == 0
            assert tgt.min() >= 180
            # distractors (present in a 0..K per-clip mixture): saturated
            # pixels (large channel spread) outside the target
            off = item["rgb"][0][~mask].astype(np.int32)
            saw_distractor |= (off.max(1) - off.min(1)).max() > 150
        assert saw_distractor

    def test_depth_shows_target_only(self):
        """Depth must localize the TARGET, not the distractors — it is the
        selection-teaching signal for the MTMM aux loss."""
        src = self._src(seed=5)
        p2 = src.patch * src.patch
        for idx in range(8):
            item = src[idx]
            for t in range(8):
                assert (item["depth"][t][:, :, 0] > 150).sum() == p2
                assert (item["n_depth"][t][:, :, 0] > 150).sum() == p2

    def test_n_depth_leads_depth_one_step(self):
        src = self._src(seed=3)
        item = src[5]
        for t in range(7):
            np.testing.assert_array_equal(item["n_depth"][t],
                                          item["depth"][t + 1])

    def test_speed_classes_differ(self):
        src = self._src()
        a = src[1]       # label 1: dir 1, speed speeds[0]
        b = src[1 + 8]   # label 9: dir 1, speed speeds[1]
        assert int(a["label"]) % 8 == int(b["label"]) % 8
        for item, vel in ((a, src.speeds[0]), (b, src.speeds[1])):
            cents = np.array([_centroid(item["depth"][t]) for t in range(8)])
            step = np.abs(np.diff(cents, axis=0)).max()
            assert abs(step - vel) < 0.5

    def test_occlusion_hides_target_frames(self):
        src = self._src(occlude=2, seed=11)
        item = src[4]
        hidden = 0
        for t in range(8):
            mask = item["depth"][t][:, :, 0] > 150
            tgt = item["rgb"][t][mask].astype(np.int32)
            achromatic = (tgt.max(1) - tgt.min(1)).max() == 0 \
                and tgt.min() >= 180
            hidden += 0 if achromatic else 1
        assert hidden == 2

    def test_deterministic(self):
        src = self._src()
        np.testing.assert_array_equal(src[2]["rgb"], src[2]["rgb"])


class TestFactoryWiring:
    def _cfg(self, **data_kw):
        data_kw.setdefault("synthetic_task", "motion")
        return Config(
            data=DataConfig(dataset="synthetic", backend="synthetic",
                            clip_len=4, batch_size=4, num_classes=16,
                            crop_size=32, scale_size=40, clip_num=2,
                            synthetic_videos=32, **data_kw),
            model=ModelConfig(arch="tsn_sd", num_segments=4, num_classes=16),
            run=RunConfig(seed=0),
        ).validate()

    @pytest.mark.parametrize("stage", ["mtmm", "sd"])
    def test_train_datasets(self, stage):
        cfg = self._cfg()
        train_ds, val_ds = build_train_datasets(cfg, stage)
        assert isinstance(train_ds, LearnableClipSource)
        assert len(train_ds) == 32 and len(val_ds) == 16
        item = train_ds[0]
        assert item["rgb"].shape == (4, 32, 32, 3)
        if stage == "mtmm":
            assert item["n_depth"].shape == (4, 32, 32, 1)
        else:
            assert "n_depth" not in item

    def test_test_dataset_distinct_from_train(self):
        cfg = self._cfg()
        train_ds, _ = build_train_datasets(cfg, "sd")
        test_ds = build_test_dataset(cfg)
        assert isinstance(test_ds, LearnableClipSource)
        assert test_ds.clip_num == 2
        # different seed -> different pixels for the same index/label
        assert not np.array_equal(train_ds[0]["rgb"], test_ds[0]["rgb"][0])

    def test_motion_hard_wiring(self):
        cfg = self._cfg(synthetic_task="motion_hard")
        train_ds, _ = build_train_datasets(cfg, "mtmm")
        assert isinstance(train_ds, LearnableClipSource) and train_ds.hard
        assert train_ds[0]["rgb"].shape == (4, 32, 32, 3)
        test_ds = build_test_dataset(cfg)
        assert test_ds.hard and test_ds.clip_num == 2

    def test_random_task_unchanged(self):
        from ehgr_tpu.data.synthetic import SyntheticClipSource
        cfg = self._cfg(synthetic_task="random")
        train_ds, _ = build_train_datasets(cfg, "sd")
        assert isinstance(train_ds, SyntheticClipSource)
