"""Multi-clip inference protocol tests (``ehgr_tpu/eval/inference.py``) and
CLI verb import/smoke coverage."""

import importlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ehgr_tpu.eval.inference import evaluate, make_score_fn
from ehgr_tpu.models.tsn import variant

CLS, T, HW, K = 5, 4, 32, 3


class TestProtocol:
    def test_clip_voting_equals_mean_softmax(self, rng):
        model = variant("tsn", num_class=CLS, num_segments=T,
                        temporal="action", partial_bn=False)
        x0 = jnp.zeros((1, T, HW, HW, 3), jnp.float32)
        variables = model.init({"params": jax.random.key(0)}, x0, train=False)

        score = make_score_fn(model, variables, crop_size=HW,
                              dtype_name="float32")
        frames = rng.integers(0, 256, (2, K, T, HW, HW, 3), dtype=np.uint8)
        probs = np.asarray(score(jnp.asarray(frames)))
        assert probs.shape == (2, CLS)
        np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-4)

        # manual per-clip scoring gives the same vote (test.py:134-150)
        flat = frames.reshape(2 * K, T, HW, HW, 3)
        p2 = np.asarray(score(jnp.asarray(flat[:, None])))  # K=1 clips
        manual = p2.reshape(2, K, CLS).mean(axis=1)
        np.testing.assert_allclose(probs, manual, rtol=1e-4, atol=1e-5)

    def test_sharded_eval_equals_single_device(self, rng):
        """Mesh-sharded scoring (videos over the data axis, optional TP
        heads) reproduces single-device probabilities exactly."""
        from ehgr_tpu.eval.inference import make_sharded_score_fn
        from ehgr_tpu.parallel.mesh import make_mesh

        # 6 classes: divisible by the 2-wide model axis so the TP-head
        # sharding path actually engages (5 % 2 != 0 would fall back)
        model = variant("tsn", num_class=6, num_segments=T,
                        temporal="action", partial_bn=False)
        x0 = jnp.zeros((1, T, HW, HW, 3), jnp.float32)
        variables = model.init({"params": jax.random.key(3)}, x0,
                               train=False)
        frames = rng.integers(0, 256, (8, K, T, HW, HW, 3), dtype=np.uint8)
        single = make_score_fn(model, variables, crop_size=HW,
                               dtype_name="float32")
        want = np.asarray(single(jnp.asarray(frames)))

        for mp in (False, True):      # pure dp / dp + TP heads (4x2 mesh)
            mesh = make_mesh(8, model_parallel=2 if mp else 1)
            sharded = make_sharded_score_fn(
                model, variables, mesh, model_parallel=mp,
                crop_size=HW, dtype_name="float32")
            got = np.asarray(sharded(frames))
            np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6,
                                       err_msg=f"model_parallel={mp}")

        with pytest.raises(AssertionError, match="divide"):
            sharded(frames[:3])       # 3 videos over 4-way data axis

    def test_evaluate_accumulates(self, rng):
        model = variant("tsn", num_class=CLS, num_segments=T,
                        temporal="none", partial_bn=False)
        x0 = jnp.zeros((1, T, HW, HW, 3), jnp.float32)
        variables = model.init({"params": jax.random.key(0)}, x0, train=False)
        score = make_score_fn(model, variables, crop_size=HW,
                              dtype_name="float32")

        def batches():
            for _ in range(2):
                yield (rng.integers(0, 256, (2, K, T, HW, HW, 3),
                                    dtype=np.uint8),
                       rng.integers(0, CLS, (2,)))

        res = evaluate(score, batches(), CLS)
        assert res["n_videos"] == 4
        assert res["confusion"].m.sum() == 4


class TestCliImports:
    @pytest.mark.parametrize("mod", [
        "cli.train", "cli.train_mtmm", "cli.train_sd", "cli.train_mtmm_sd",
        "cli.train_sd_actionnet", "cli.train_slowonly", "cli.train_videomae",
        "cli.test", "cli.test_sd", "cli.test_sd_actionnet",
        "cli.cam_visualize", "cli.case_study", "cli.prepare_data",
    ])
    def test_importable_with_main(self, mod):
        m = importlib.import_module(mod)
        assert callable(m.main)
