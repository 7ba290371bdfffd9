"""Streaming recognizer tests: window/stride firing, EMA smoothing,
threshold + min-window debounce, event lifecycle, real-model smoke."""

import numpy as np

import jax
import jax.numpy as jnp

from ehgr_tpu.eval.streaming import (StreamingRecognizer,
                                     make_stream_score_fn)
from ehgr_tpu.models.tsn import variant

HW, T, CLS = 16, 4, 5


def _frame(v=0):
    return np.full((HW, HW, 3), v, np.uint8)


class _StubScorer:
    """Scripted per-window probability source; records window shapes."""

    def __init__(self, probs):
        self.probs = list(probs)
        self.calls = []

    def __call__(self, clip):
        self.calls.append(clip.shape)
        return np.asarray([self.probs.pop(0)], np.float32)


def _probs(label, conf):
    p = np.full(CLS, (1.0 - conf) / (CLS - 1), np.float32)
    p[label] = conf
    return p


class TestFiring:
    def test_window_cadence_and_shape(self):
        stub = _StubScorer([_probs(0, 0.2)] * 10)
        r = StreamingRecognizer(stub, num_segments=T, window=8, stride=3,
                                smooth=0.0, threshold=0.9)
        for _ in range(20):
            r.push(_frame())
        # first fire at frame T=4 (stride counter starts at stream start),
        # then every 3 frames: 4, 7, 10, 13, 16, 19
        assert len(stub.calls) == 6
        assert all(s == (1, T, HW, HW, 3) for s in stub.calls)

    def test_no_fire_before_t_frames(self):
        stub = _StubScorer([_probs(0, 0.99)] * 4)
        r = StreamingRecognizer(stub, num_segments=T, window=8, stride=1,
                                min_windows=1)
        for _ in range(T - 1):
            assert r.push(_frame()) == []
        assert stub.calls == []


class TestDebounce:
    def test_min_windows_hysteresis(self):
        # one confident window then silence: no start with min_windows=2
        stub = _StubScorer([_probs(2, 0.95), _probs(2, 0.1),
                            _probs(2, 0.1)])
        r = StreamingRecognizer(stub, num_segments=T, window=4, stride=4,
                                smooth=0.0, threshold=0.6, min_windows=2)
        events = []
        for _ in range(12):
            events += r.push(_frame())
        assert events == []

    def test_start_and_end_lifecycle(self):
        stub = _StubScorer([_probs(3, 0.9), _probs(3, 0.9),
                            _probs(3, 0.9), _probs(3, 0.05)])
        r = StreamingRecognizer(stub, num_segments=T, window=4, stride=4,
                                smooth=0.0, threshold=0.6, min_windows=2)
        events = []
        for _ in range(16):
            events += r.push(_frame())
        kinds = [(e.kind, e.label) for e in events]
        assert kinds == [("start", 3), ("end", 3)]
        assert events[0].frame_index == 8      # second confident window
        assert events[1].frame_index == 16

    def test_label_switch_ends_then_starts(self):
        stub = _StubScorer([_probs(1, 0.9)] * 2 + [_probs(4, 0.9)] * 2)
        r = StreamingRecognizer(stub, num_segments=T, window=4, stride=4,
                                smooth=0.0, threshold=0.6, min_windows=1)
        events = []
        for _ in range(16):
            events += r.push(_frame())
        kinds = [(e.kind, e.label) for e in events]
        assert kinds == [("start", 1), ("end", 1), ("start", 4)]

    def test_background_class_never_starts(self):
        stub = _StubScorer([_probs(0, 0.99)] * 3)
        r = StreamingRecognizer(stub, num_segments=T, window=4, stride=4,
                                smooth=0.0, threshold=0.6, min_windows=1,
                                background_class=0)
        events = []
        for _ in range(12):
            events += r.push(_frame())
        assert events == []

    def test_flush_closes_active(self):
        stub = _StubScorer([_probs(2, 0.9)] * 2)
        r = StreamingRecognizer(stub, num_segments=T, window=4, stride=4,
                                smooth=0.0, threshold=0.6, min_windows=1)
        for _ in range(8):
            r.push(_frame())
        assert r.state["active"] == 2
        ev = r.flush()
        assert [(e.kind, e.label) for e in ev] == [("end", 2)]
        assert r.flush() == []


class TestSmoothing:
    def test_ema_blends_windows(self):
        stub = _StubScorer([_probs(1, 1.0), _probs(2, 1.0)])
        r = StreamingRecognizer(stub, num_segments=T, window=4, stride=4,
                                smooth=0.5, threshold=2.0)  # never fires
        for _ in range(8):
            r.push(_frame())
        # after two windows: 0.5*p1 + 0.5*p2
        assert np.isclose(r._probs[1], 0.5, atol=1e-6)
        assert np.isclose(r._probs[2], 0.5, atol=1e-6)


class TestCascadeComposition:
    def test_stream_windows_through_cascade(self):
        """The documented pairing: cascade scorer as the stream score_fn —
        confident windows stay on the exit stage, uncertain ones escalate."""
        from ehgr_tpu.eval.cascade import (build_cascade_score_fns,
                                           execute_cascade)
        from ehgr_tpu.train.checkpoints import merge_variables

        x0 = jnp.zeros((1, T, 32, 32, 3), jnp.float32)
        sd = variant("tsn_sd", num_class=CLS, num_segments=T,
                     temporal="action", partial_bn=False)
        sd_vars = sd.init({"params": jax.random.key(1)}, x0, train=False)
        stages = []
        for arch in ("tsn_middle1", "tsn"):
            m = variant(arch, num_class=CLS, num_segments=T,
                        temporal="action", partial_bn=False)
            v = m.init({"params": jax.random.key(0)}, x0, train=False)
            stages.append((m, merge_variables(dict(v), dict(sd_vars))[0]))
        score_exit, score_full = build_cascade_score_fns(
            stages[0][0], stages[0][1], stages[1][0], stages[1][1],
            scale_size=32, crop_size=32, square_resize=True,
            dtype_name="float32")
        escalations = []

        def fn(clip_u8):
            run = execute_cascade(score_exit, score_full,
                                  clip_u8[:, None], threshold=0.5)
            escalations.append(bool(run["escalated"][0]))
            return run["probs"]

        r = StreamingRecognizer(fn, num_segments=T, window=8, stride=4,
                                threshold=1.1)
        rng = np.random.default_rng(5)
        for _ in range(12):
            r.push(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8))
        assert len(escalations) == 3          # windows at frames 4, 8, 12
        assert r._probs is not None and r._probs.shape == (CLS,)


class TestRealModel:
    def test_tsn_stream_smoke(self):
        model = variant("tsn", num_class=CLS, num_segments=T,
                        temporal="action", partial_bn=False)
        x0 = jnp.zeros((1, T, 32, 32, 3), jnp.float32)
        variables = model.init({"params": jax.random.key(0)}, x0,
                               train=False)
        fn = make_stream_score_fn(model, variables, crop_size=32,
                                  dtype_name="float32")
        r = StreamingRecognizer(fn, num_segments=T, window=8, stride=4,
                                threshold=1.1)   # mechanics only
        rng = np.random.default_rng(0)
        for _ in range(12):
            r.push(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8))
        assert r.state["frames_seen"] == 12
        assert r._probs is not None and r._probs.shape == (CLS,)
        assert np.isclose(r._probs.sum(), 1.0, atol=1e-3)