"""Data-layer tests: annotation builder on a synthetic EgoGesture tree,
dataset variants, loader batching/prefetch (SURVEY.md §4 pyramid base)."""

import os

import numpy as np
import pandas as pd
import pytest

from ehgr_tpu.data.annotations import (EGO_SPLITS, construct_annot_ego,
                                       load_annotations)
from ehgr_tpu.data.datasets import (DATASETS, DistillDataset, InferenceDataset,
                                    MTMMDataset, OriginalDataset, SDDataset)
from ehgr_tpu.data.pipeline import Loader, collate
from ehgr_tpu.data.synthetic import SyntheticClipSource, make_synthetic_ego_tree
from ehgr_tpu.ops import spatial_transforms as st

T = 4


@pytest.fixture(scope="module")
def annot_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ego")
    paths = make_synthetic_ego_tree(str(root), subjects=(3, 1, 2),
                                    gestures_per_group=3,
                                    frames_per_gesture=20, num_classes=5)
    save = str(root / "annot")
    for mode in ("train", "val", "test"):
        construct_annot_ego(paths["frame_path"], paths["label_path"],
                            save, mode)
    return save


class TestAnnotations:
    def test_schema(self, annot_dir):
        df = load_annotations(annot_dir, "train")
        assert list(df.columns) == ["rgb", "depth", "depth_est", "label"]
        assert len(df) == 3  # 3 gestures for subject 3
        # frame range is [start, end-1): 20 frames recorded as end=start+21
        assert len(df["rgb"].iloc[0]) == 20
        assert all(os.path.isfile(p) for p in df["rgb"].iloc[0][:3])
        assert 0 <= int(df["label"].iloc[0]) < 5  # 0-based

    def test_splits_disjoint(self):
        assert not set(EGO_SPLITS["train"]) & set(EGO_SPLITS["val"])
        assert not set(EGO_SPLITS["train"]) & set(EGO_SPLITS["test"])
        assert len(EGO_SPLITS["train_plus_val"]) == 40


class TestDatasets:
    def test_original(self, annot_dir):
        ds = OriginalDataset(annot_dir, "train", clip_len=T,
                             spatial_transform=st.GroupScale([32, 32]))
        s = ds[0]
        assert s["rgb"].shape == (T, 32, 32, 3)
        assert s["rgb"].dtype == np.uint8
        assert s["depth"].shape == (T, 32, 32, 1)

    def test_mtmm_six_fields(self, annot_dir):
        ds = MTMMDataset(annot_dir, "train", clip_len=T,
                         spatial_transform=st.GroupScale([32, 32]))
        s = ds[0]
        assert set(s) == {"rgb", "depth", "depth_est", "n_depth",
                          "n_depth_est", "label"}
        assert s["n_depth"].shape == (T, 32, 32, 1)

    def test_sd_and_distill(self, annot_dir):
        for cls in (SDDataset, DistillDataset):
            s = cls(annot_dir, "train", clip_len=T,
                    spatial_transform=st.GroupScale([32, 32]))[0]
            assert set(s) == {"rgb", "label"}

    def test_inference_clips(self, annot_dir):
        ds = InferenceDataset(annot_dir, "test", clip_len=T, clip_num=5,
                              spatial_transform=st.GroupScale([32, 32]))
        s = ds[0]
        assert s["rgb"].shape == (5, T, 32, 32, 3)

    def test_registry_complete(self):
        assert set(DATASETS) == {"original", "mtmm", "sd", "distill",
                                 "inference", "case_study"}


class TestLoader:
    def test_batching_and_shapes(self, annot_dir):
        ds = SDDataset(annot_dir, "train", clip_len=T,
                       spatial_transform=st.GroupScale([32, 32]))
        loader = Loader(ds, batch_size=2, shuffle=True, num_workers=2)
        batches = list(loader)
        assert len(batches) == len(ds) // 2
        assert batches[0]["rgb"].shape == (2, T, 32, 32, 3)
        assert batches[0]["label"].shape == (2,)

    def test_shuffle_deterministic_per_epoch(self):
        ds = SyntheticClipSource(n_videos=16, clip_len=2, size=(8, 8),
                                 num_classes=4)
        l1 = Loader(ds, 4, shuffle=True, seed=7, num_workers=1)
        l2 = Loader(ds, 4, shuffle=True, seed=7, num_workers=1)
        b1 = [b["label"] for b in l1]
        b2 = [b["label"] for b in l2]
        for a, b in zip(b1, b2):
            np.testing.assert_array_equal(a, b)
        # second epoch reshuffles
        b1b = [b["label"] for b in l1]
        assert any(not np.array_equal(a, b) for a, b in zip(b1, b1b))

    def test_worker_exception_propagates_not_hangs(self):
        """A dataset error must re-raise in the consumer (torch DataLoader
        semantics) — the round-2 deadlock: a dead producer never delivered
        its sentinel and the consumer blocked on q.get forever."""
        class Exploding:
            def __len__(self):
                return 8

            def __getitem__(self, i):
                if i >= 4:
                    raise ValueError("boom at index %d" % i)
                return {"rgb": np.zeros((2, 8, 8, 3), np.uint8),
                        "label": np.int32(0)}

        loader = Loader(Exploding(), batch_size=2, shuffle=False,
                        num_workers=2)
        with pytest.raises(ValueError, match="boom"):
            list(loader)

    def test_abandoned_iterator_stops_producer(self):
        """Breaking out of an epoch early (max_steps-bounded loops) must
        terminate the producer thread instead of leaking it parked on a
        full queue."""
        import threading as _th
        import time as _time

        ds = SyntheticClipSource(n_videos=32, clip_len=2, size=(8, 8),
                                 num_classes=4)
        before = _th.active_count()
        for _ in range(5):
            for i, _b in enumerate(Loader(ds, 2, num_workers=1)):
                if i == 1:
                    break
        deadline = _time.time() + 5.0
        while _th.active_count() > before and _time.time() < deadline:
            _time.sleep(0.1)
        assert _th.active_count() <= before + 1

    def test_synthetic_source_fields(self):
        ds = SyntheticClipSource(n_videos=4, clip_len=2, size=(8, 8),
                                 fields=("rgb", "depth", "n_depth"))
        s = ds[0]
        assert s["rgb"].shape == (2, 8, 8, 3)
        assert s["n_depth"].shape == (2, 8, 8, 1)
        # deterministic per index
        np.testing.assert_array_equal(ds[1]["rgb"], ds[1]["rgb"])
