"""Golden-logit regression anchors + trainer batch-contract tests.

The golden values pin today's verified numerics (ACTION parity vs torch,
loss/optimizer parity) so future kernel work (e.g. the ACTION megakernel)
can't silently drift the model function."""

import numpy as np

import jax
import jax.numpy as jnp

from ehgr_tpu.models.tsn import variant
from ehgr_tpu.train.loop import select_batch

GOLD_FINAL = [-6.153431415557861, 9.241020202636719, 2.755786895751953,
              16.64885139465332, -0.8288863897323608]
GOLD_MID1 = [-0.0006691612652502954, -0.001321121584624052,
             0.001529218745417893, 0.0009384938748553395,
             0.0009153317078016698]


class TestGoldenLogits:
    def test_tsn_sd_logits_stable(self):
        model = variant("tsn_sd", num_class=5, num_segments=4,
                        temporal="action", partial_bn=False)
        x = jnp.asarray(
            np.linspace(-1, 1, 2 * 4 * 32 * 32 * 3, dtype=np.float32)
            .reshape(2, 4, 32, 32, 3))
        v = model.init({"params": jax.random.key(42)}, x, train=False)
        out = model.apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(out[0])[0], GOLD_FINAL,
                                   rtol=2e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out[1])[0], GOLD_MID1,
                                   rtol=2e-3, atol=1e-6)


class TestSelectBatch:
    def _batch(self):
        mk = lambda: np.zeros((2, 4, 8, 8, 1), np.uint8)
        return {"rgb": np.zeros((2, 4, 8, 8, 3), np.uint8),
                "label": np.zeros(2, np.int32),
                "depth": mk() + 1, "depth_est": mk() + 2,
                "n_depth": mk() + 3, "n_depth_est": mk() + 4}

    def test_mtmm_uses_next_segment_depth(self):
        b = select_batch(self._batch(), "mtmm", "rgb_depth")
        assert int(b["depth"][0, 0, 0, 0, 0]) == 3     # n_depth

    def test_mtmm_depthest_uses_next_pseudo_depth(self):
        b = select_batch(self._batch(), "mtmm", "rgb_depthest")
        assert int(b["depth"][0, 0, 0, 0, 0]) == 4     # n_depth_est

    def test_joint_stage_uses_current_depth(self):
        b = select_batch(self._batch(), "mtmm_sd", "rgb_depth")
        assert int(b["depth"][0, 0, 0, 0, 0]) == 1     # current depth

    def test_sd_has_no_depth(self):
        b = select_batch(self._batch(), "sd", "rgb")
        assert set(b) == {"rgb", "label"}
