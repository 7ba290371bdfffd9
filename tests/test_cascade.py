"""Early-exit cascade deployment tests (ehgr_tpu/eval/cascade.py).

Pins: (1) one tsn_sd checkpoint feeds BOTH cascade stages (tsn_middleK
absorbs the exit branch, plain tsn absorbs the final head); (2) the real
bucketed two-pass execution equals the analytic threshold sweep; (3) the
threshold endpoints degenerate to exit-only / full-only deployment."""

import numpy as np

import jax
import jax.numpy as jnp

from ehgr_tpu.eval.cascade import (bucket_size, collect_scores,
                                   execute_cascade, sweep_thresholds,
                                   build_cascade_score_fns)
from ehgr_tpu.models.tsn import variant
from ehgr_tpu.train.checkpoints import merge_variables

T, HW, CLS = 4, 32, 5
SCORE_KW = dict(scale_size=HW, crop_size=HW, square_resize=True,
                dtype_name="float32")


def _models():
    sd = variant("tsn_sd", num_class=CLS, num_segments=T,
                 temporal="action", partial_bn=False)
    x0 = jnp.zeros((1, T, HW, HW, 3), jnp.float32)
    sd_vars = sd.init({"params": jax.random.key(7)}, x0, train=False)

    out = []
    for arch in ("tsn_middle1", "tsn"):
        m = variant(arch, num_class=CLS, num_segments=T,
                    temporal="action", partial_bn=False)
        v = m.init({"params": jax.random.key(0)}, x0, train=False)
        merged, _ = merge_variables(dict(v), dict(sd_vars))
        out.append((m, merged))
    return sd_vars, out


def _frames(v=6, k=2, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (v, k, T, HW, HW, 3), dtype=np.uint8)


class TestBucketSize:
    def test_pow2_and_cap(self):
        assert bucket_size(0, 8) == 0
        assert bucket_size(1, 8) == 1
        assert bucket_size(3, 8) == 4
        assert bucket_size(5, 8) == 8
        assert bucket_size(7, 4) == 4   # capped at the pass-1 batch


class TestCheckpointSharing:
    def test_sd_tree_feeds_both_stages(self):
        sd_vars, [(_, v_mid), (_, v_full)] = _models()
        # exit stage absorbed the shared stem + its exit branch
        np.testing.assert_array_equal(
            v_mid["params"]["base_model"]["conv1"]["kernel"],
            sd_vars["params"]["base_model"]["conv1"]["kernel"])
        np.testing.assert_array_equal(
            v_mid["params"]["middle_fc1"]["kernel"],
            sd_vars["params"]["middle_fc1"]["kernel"])
        # full stage absorbed the final head
        np.testing.assert_array_equal(
            v_full["params"]["new_fc"]["kernel"],
            sd_vars["params"]["new_fc"]["kernel"])


class TestCascade:
    def setup_method(self):
        _, [(m1, v1), (mf, vf)] = _models()
        self.score_exit, self.score_full = build_cascade_score_fns(
            m1, v1, mf, vf, **SCORE_KW)

    def test_endpoints(self):
        frames = _frames(v=8)
        p_exit = np.asarray(self.score_exit(jnp.asarray(frames)))
        p_full = np.asarray(self.score_full(jnp.asarray(frames)))
        none = execute_cascade(self.score_exit, self.score_full, frames,
                               threshold=0.0)     # conf < 0 never
        assert not none["escalated"].any()
        np.testing.assert_array_equal(none["pred"], p_exit.argmax(-1))
        every = execute_cascade(self.score_exit, self.score_full, frames,
                                threshold=1.1)    # conf < 1.1 always
        assert every["escalated"].all()
        np.testing.assert_array_equal(every["pred"], p_full.argmax(-1))

    def test_execute_matches_sweep(self):
        frames = _frames(v=8)
        labels = np.arange(8) % CLS
        scores = collect_scores(self.score_exit, self.score_full,
                                [(frames, labels)])
        # pick a threshold that splits the batch (median confidence)
        tau = float(np.median(scores["p_exit"].max(-1)))
        run = execute_cascade(self.score_exit, self.score_full, frames, tau)
        esc = scores["p_exit"].max(-1) < tau
        expect = np.where(esc, scores["p_full"].argmax(-1),
                          scores["p_exit"].argmax(-1))
        np.testing.assert_array_equal(run["escalated"], esc)
        np.testing.assert_array_equal(run["pred"], expect)
        assert 0 < esc.sum() < 8, "median threshold should split the batch"

    def test_sweep_curve_shape(self):
        frames = _frames(v=8)
        labels = np.zeros(8, np.int64)
        scores = collect_scores(self.score_exit, self.score_full,
                                [(frames, labels)])
        rows = sweep_thresholds(scores, [0.0, 0.5, 1.1],
                                rate_exit=1000.0, rate_full=400.0)
        assert rows[0]["escalated_pct"] == 0.0
        assert rows[-1]["escalated_pct"] == 100.0
        # escalation (and thus cost) is monotone in the threshold
        fracs = [r["escalated_pct"] for r in rows]
        assert fracs == sorted(fracs)
        assert rows[0]["effective_clips_per_sec"] > \
            rows[-1]["effective_clips_per_sec"]
        # all-escalate effective rate is the series combination, slower
        # than the full model alone
        assert rows[-1]["effective_clips_per_sec"] < 400.0
