"""Golden-value tests for the temporal samplers.

Goldens are hand-derived from the reference algorithms
(``/root/reference/models/temporal_transforms.py``); randomized cases check
the structural invariants (segment containment, bounds, determinism)."""

import numpy as np
import pytest

from ehgr_tpu.ops import temporal_transforms as tt


class TestUniformVal:
    def test_golden_100_frames(self):
        # tick = 12.5 -> int(6.25 + 12.5*i)
        out = tt.uniform_val(100, 8)
        np.testing.assert_array_equal(out, [6, 18, 31, 43, 56, 68, 81, 93])

    def test_short_video_zeros(self):
        np.testing.assert_array_equal(tt.uniform_val(5, 8), np.zeros(8))
        # num_frames == size -> zeros too (reference: `>` comparison)
        np.testing.assert_array_equal(tt.uniform_val(8, 8), np.zeros(8))

    def test_exact_double(self):
        out = tt.uniform_val(16, 8)
        np.testing.assert_array_equal(out, [1, 3, 5, 7, 9, 11, 13, 15])


class TestUniformTest:
    def test_no_short_guard(self):
        out = tt.uniform_test(100, 8)
        np.testing.assert_array_equal(out, [6, 18, 31, 43, 56, 68, 81, 93])


class TestUniformTrain:
    def test_segment_containment(self, rng):
        nf, size = 100, 8
        avg = nf // size  # 12
        for _ in range(20):
            out = tt.uniform_train(nf, size, rng)
            assert out.shape == (size,)
            base = np.arange(size) * avg
            assert np.all(out >= base) and np.all(out < base + avg)

    def test_short_video_zeros(self, rng):
        np.testing.assert_array_equal(tt.uniform_train(5, 8, rng), np.zeros(8))

    def test_deterministic_under_seed(self):
        a = tt.uniform_train(100, 8, np.random.default_rng(7))
        b = tt.uniform_train(100, 8, np.random.default_rng(7))
        np.testing.assert_array_equal(a, b)


class TestDense:
    def test_train_stride_and_bounds(self, rng):
        out = tt.dense_train(200, 8, rng)  # stride 8
        assert out.shape == (8,)
        assert np.all(out >= 0) and np.all(out < 200)
        diffs = np.diff(out)
        assert np.all(diffs == 8)  # no wraparound when video long enough

    def test_train_wraparound_short(self, rng):
        out = tt.dense_train(10, 8, rng)  # stride 8 > length -> modulo
        assert np.all(out < 10)

    def test_test_shape_and_first_clip(self):
        out = tt.dense_test(200, 8, 10)
        assert out.shape == (10, 8)
        np.testing.assert_array_equal(out[0], np.arange(8) * 8)


class TestCrops:
    def test_begin(self):
        np.testing.assert_array_equal(tt.begin_crop(20, 8), np.arange(8))

    def test_begin_loop_pad(self):
        np.testing.assert_array_equal(
            tt.begin_crop(3, 8), [0, 1, 2, 0, 1, 2, 0, 1])

    def test_end(self):
        np.testing.assert_array_equal(tt.end_crop(20, 8), np.arange(12, 20))

    def test_center(self):
        # center=10, begin=6, end=14
        np.testing.assert_array_equal(tt.center_crop(20, 8), np.arange(6, 14))

    def test_random_bounds(self, rng):
        for _ in range(10):
            out = tt.random_crop(50, 8, rng)
            assert out.shape == (8,)
            assert np.all(np.diff(out) == 1)
            assert out[0] >= 0 and out[-1] < 50


class TestNextSegment:
    def test_shifts_and_appends(self):
        sel = np.array([2, 10, 20, 30])
        out = tt.next_segment_indices(sel, 100)
        np.testing.assert_array_equal(out, [10, 20, 30, 31])

    def test_clamps_at_video_end(self):
        sel = np.array([2, 10, 20, 99])
        out = tt.next_segment_indices(sel, 100)
        np.testing.assert_array_equal(out, [10, 20, 99, 99])


class TestMultiClip:
    def test_shape_and_variety(self, rng):
        out = tt.multi_clip_indices(100, 8, 10, rng)
        assert out.shape == (10, 8)
        # with avg duration 12, 10 random clips should not all be identical
        assert len({tuple(r) for r in out}) > 1


class TestEgoVariants:
    def test_ego_train_short_video_repeats_random_frame(self):
        rng = np.random.default_rng(3)
        out = tt.uniform_ego_train(5, 8, rng)
        assert len(set(out.tolist())) == 1
        assert 0 <= out[0] < 5

    def test_ego_val_short_video_repeats_middle(self):
        out = tt.uniform_ego_val(5, 8)
        np.testing.assert_array_equal(out, np.full(8, 2))

    def test_ego_long_video_matches_plain(self):
        rng = np.random.default_rng(0)
        a = tt.uniform_ego_train(100, 8, np.random.default_rng(1))
        b = tt.uniform_train(100, 8, np.random.default_rng(1))
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(tt.uniform_ego_val(100, 8),
                                      tt.uniform_val(100, 8))
