"""3D model family contract tests (R(2+1)D-18, MTMM variant, SlowOnly-R50)."""

import numpy as np

import jax
import jax.numpy as jnp

from ehgr_tpu.models.video3d import R2Plus1D18, SlowOnlyR50, _midplanes

N, T, HW, CLS = 1, 8, 64, 7


def init_run(model):
    x = jnp.zeros((N, T, HW, HW, 3), jnp.float32)
    v = model.init({"params": jax.random.key(0)}, x, train=False)
    return model.apply(v, x, train=False)


class TestR2Plus1D:
    def test_midplanes_matches_torchvision_formula(self):
        # torchvision: (3*64*3*3*3)//(3*3*3 + 3*64) = 45 for the stem analog
        assert _midplanes(64, 64) == (64 * 64 * 27) // (64 * 9 + 3 * 64)

    def test_logits(self):
        out = init_run(R2Plus1D18(num_class=CLS))
        assert out.shape == (N, CLS)

    def test_mtmm_depth_shape(self):
        logits, depth = init_run(R2Plus1D18(num_class=CLS, with_depth=True))
        assert logits.shape == (N, CLS)
        # layer4: T=1 (8/2^3), 4x4 spatial at 64^2 input (stem/2 + 3 stages)
        # decoder: T 1->2->4->8; spatial 4->8->16->16
        assert depth.shape == (N, 8, 16, 16, 1)
        assert float(depth.min()) >= 0  # final ReLU (reference quirk)

    def test_train_step_grad(self, rng):
        model = R2Plus1D18(num_class=CLS)
        x = jnp.asarray(rng.standard_normal((N, T, 32, 32, 3)), jnp.float32)
        v = model.init({"params": jax.random.key(0)}, x, train=False)

        def loss(p):
            out = model.apply({"params": p,
                               "batch_stats": v["batch_stats"]},
                              x, train=False)
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(v["params"])
        assert np.isfinite(float(jax.tree.leaves(g)[0].sum()))


class TestSlowOnly:
    def test_logits_and_temporal_preserved(self):
        out = init_run(SlowOnlyR50(num_class=CLS))
        assert out.shape == (N, CLS)

    def test_param_count_matches_r50_scale(self):
        model = SlowOnlyR50(num_class=83)
        x = jnp.zeros((1, 8, 64, 64, 3), jnp.float32)
        v = model.init({"params": jax.random.key(0)}, x, train=False)
        n_params = sum(p.size for p in jax.tree.leaves(v["params"]))
        assert 25e6 < n_params < 40e6  # slow_r50 ~32M
