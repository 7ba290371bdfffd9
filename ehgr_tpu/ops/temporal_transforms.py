"""Temporal frame-index samplers as pure functions.

Reference: ``/root/reference/models/temporal_transforms.py`` — a set of
stateful callables over Python lists.  Here every sampler is a pure function
``(num_frames, size, rng) -> int32 ndarray`` so it can run on the host (numpy)
or inside a jitted pipeline (the math is identical; host use is the default
since frame decode happens host-side anyway).

Semantics replicated exactly:

* ``uniform_train``  = TemporalUniformCrop_train  (ref :235-247): TSN segment
  sampling — split ``range(num_frames)`` into ``size`` segments of length
  ``num_frames // size`` and draw a uniform offset per segment; if the video
  is shorter than ``size`` frames, all-zeros.
* ``uniform_val``    = TemporalUniformCrop_val    (ref :252-266): centers
  ``int(tick/2 + tick*i)`` with ``tick = num_frames / size``; all-zeros when
  ``num_frames <= size``.
* ``uniform_test``   = TemporalUniformCrop_test   (ref :270-280): centers,
  no short-video guard (matches reference, which indexes modulo nothing).
* ``dense_train`` / ``dense_test`` = TemporalDense_train/_test (ref :140-198):
  I3D-style stride ``64 // size`` dense sampling with wraparound.
* ``begin/end/center/random_crop`` = TemporalBegin/End/Center/RandomCrop
  (ref :24-137): contiguous crops with loop-padding.
* ``loop_padding``   = LoopPadding (ref :8-21).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "uniform_train", "uniform_val", "uniform_test",
    "dense_train", "dense_test",
    "begin_crop", "end_crop", "center_crop", "random_crop",
    "loop_padding", "next_segment_indices", "multi_clip_indices",
]


def _as_int(x) -> np.ndarray:
    return np.asarray(x, dtype=np.int64)


def uniform_train(num_frames: int, size: int, rng: np.random.Generator) -> np.ndarray:
    """TSN per-segment random sampling (TemporalUniformCrop_train)."""
    average_duration = num_frames // size
    if average_duration > 0:
        base = np.arange(size, dtype=np.int64) * average_duration
        offsets = rng.integers(0, average_duration, size=size)
        return base + offsets
    return np.zeros((size,), dtype=np.int64)


def uniform_val(num_frames: int, size: int) -> np.ndarray:
    """Per-segment center sampling (TemporalUniformCrop_val)."""
    if num_frames > size:
        tick = num_frames / float(size)
        return _as_int([int(tick / 2.0 + tick * x) for x in range(size)])
    return np.zeros((size,), dtype=np.int64)


def uniform_test(num_frames: int, size: int) -> np.ndarray:
    """Per-segment center sampling without the short-video guard
    (TemporalUniformCrop_test)."""
    tick = num_frames / float(size)
    return _as_int([int(tick / 2.0 + tick * x) for x in range(size)])


def dense_train(num_frames: int, size: int, rng: np.random.Generator) -> np.ndarray:
    """I3D dense sampling, random window start (TemporalDense_train)."""
    t_stride = 64 // size
    sample_pos = max(1, 1 + num_frames - t_stride * size)
    start_idx = 0 if sample_pos == 1 else int(rng.integers(0, sample_pos - 1))
    return _as_int([(i * t_stride + start_idx) % num_frames for i in range(size)])


def dense_test(num_frames: int, size: int, clip_num: int) -> np.ndarray:
    """I3D dense sampling at linspaced window starts; returns
    ``[clip_num, size]`` (TemporalDense_test)."""
    t_stride = 64 // size
    sample_pos = max(1, 1 + num_frames - t_stride * size)
    start_list = np.linspace(0, sample_pos - 1, num=clip_num, dtype=int)
    out = [[(i * t_stride + s) % num_frames for i in range(size)]
           for s in start_list.tolist()]
    return _as_int(out).reshape(clip_num, size)


def loop_padding(indices: np.ndarray, size: int) -> np.ndarray:
    """Cycle ``indices`` until it has at least ``size`` entries (LoopPadding)."""
    out = list(np.asarray(indices, dtype=np.int64))
    for idx in out:
        if len(out) >= size:
            break
        out.append(idx)
    return _as_int(out[:max(size, len(out))]) if len(out) >= size else _as_int(out)


def begin_crop(num_frames: int, size: int) -> np.ndarray:
    return loop_padding(np.arange(min(num_frames, size)), size)


def end_crop(num_frames: int, size: int) -> np.ndarray:
    start = max(0, num_frames - size)
    return loop_padding(np.arange(start, num_frames), size)


def center_crop(num_frames: int, size: int) -> np.ndarray:
    center = num_frames // 2
    begin = max(0, center - size // 2)
    end = min(begin + size, num_frames)
    return loop_padding(np.arange(begin, end), size)


def random_crop(num_frames: int, size: int, rng: np.random.Generator) -> np.ndarray:
    rand_end = max(0, num_frames - size - 1)
    begin = int(rng.integers(0, rand_end + 1))
    end = min(begin + size, num_frames)
    return loop_padding(np.arange(begin, end), size)


def uniform_ego_train(num_frames: int, size: int,
                      rng: np.random.Generator) -> np.ndarray:
    """Ego variant (TemporalUniformCrop_ego_train, ref :202-214): short
    videos repeat ONE random frame instead of frame 0."""
    average_duration = num_frames // size
    if average_duration > 0:
        base = np.arange(size, dtype=np.int64) * average_duration
        return base + rng.integers(0, average_duration, size=size)
    return np.full((size,), rng.integers(0, num_frames), dtype=np.int64)


def uniform_ego_val(num_frames: int, size: int) -> np.ndarray:
    """Ego variant (ref :217-231): short videos repeat the middle frame."""
    if num_frames > size:
        tick = num_frames / float(size)
        return _as_int([int(tick / 2.0 + tick * x) for x in range(size)])
    return np.full((size,), num_frames // 2, dtype=np.int64)


def next_segment_indices(selected: np.ndarray, num_frames: int) -> np.ndarray:
    """Next-segment indices for MTMM depth supervision: drop the first index,
    append ``last+1`` clamped to the video length
    (``data/dataset_EgoGesture.py:190-192``)."""
    selected = np.asarray(selected, dtype=np.int64)
    last = int(selected[-1])
    nxt = last + 1 if last + 1 < num_frames else last
    return np.append(selected[1:], nxt)


def multi_clip_indices(num_frames: int, size: int, clip_num: int,
                       rng: np.random.Generator) -> np.ndarray:
    """The multi-clip test protocol: ``clip_num`` independent uniform_train
    samples per video (``test.py:235-244`` + ``dataset_video_inference``).
    Returns ``[clip_num, size]``."""
    return np.stack([uniform_train(num_frames, size, rng)
                     for _ in range(clip_num)], axis=0)
