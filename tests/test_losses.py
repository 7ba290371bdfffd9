"""Loss-numerics parity vs torch implementations of the reference formulas
(``train_sd.py:176-193``, ``train_mtmm.py:223-231``)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ehgr_tpu.train import losses

B, C = 8, 83
T_KD = 3.0


class TestCrossEntropy:
    def test_matches_torch(self, rng):
        logits = rng.standard_normal((B, C)).astype(np.float32)
        labels = rng.integers(0, C, B)
        got = losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
        ref = F.cross_entropy(torch.from_numpy(logits),
                              torch.from_numpy(labels))
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)


class TestKD:
    def test_matches_reference_formula(self, rng):
        mid = rng.standard_normal((B, C)).astype(np.float32)
        fin = rng.standard_normal((B, C)).astype(np.float32)
        got = losses.kd_loss(jnp.asarray(mid), jnp.asarray(fin), T_KD)

        out = torch.from_numpy(mid) / T_KD
        target = torch.softmax(torch.from_numpy(fin) / T_KD, dim=1)
        ref = -torch.mean(torch.sum(
            torch.log_softmax(out, dim=1) * target, dim=1)) * (T_KD ** 2)
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)

    def test_teacher_detached(self, rng):
        import jax

        mid = jnp.asarray(rng.standard_normal((B, C)), jnp.float32)
        fin = jnp.asarray(rng.standard_normal((B, C)), jnp.float32)
        g = jax.grad(lambda f: losses.kd_loss(mid, f, T_KD))(fin)
        np.testing.assert_array_equal(np.asarray(g), 0)


class TestFeatureHint:
    def test_matches_reference_formula(self, rng):
        fea = rng.standard_normal((B, 32)).astype(np.float32)
        tgt = rng.standard_normal((B, 32)).astype(np.float32)
        got = losses.feature_hint_loss(jnp.asarray(fea), jnp.asarray(tgt))

        f, t = torch.from_numpy(fea), torch.from_numpy(tgt)
        ref = torch.abs((f - t) ** 2 * ((f > 0) | (t > 0)).float()).sum()
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)

    def test_sum_not_mean(self):
        """Scaling with batch size is intentional (beta=1e-6 compensates)."""
        f = jnp.ones((4, 8))
        t = jnp.zeros((4, 8))
        assert float(losses.feature_hint_loss(f, t)) == 32.0


class TestTotals:
    def test_mtmm_weighting(self, rng):
        logits = jnp.asarray(rng.standard_normal((B, C)), jnp.float32)
        labels = jnp.asarray(rng.integers(0, C, B))
        dp = jnp.asarray(rng.random((B, 56, 56, 1)), jnp.float32)
        dg = jnp.asarray(rng.random((B, 56, 56, 1)), jnp.float32)
        total, aux = losses.mtmm_total(logits, labels, dp, dg, 0.01)
        np.testing.assert_allclose(
            float(total), float(aux["ce"]) + 0.01 * float(aux["depth"]),
            rtol=1e-6)

    def test_sd_weighting(self, rng):
        def r():
            return jnp.asarray(rng.standard_normal((B, C)), jnp.float32)

        def rf():
            return jnp.asarray(rng.standard_normal((B, 64)), jnp.float32)

        labels = jnp.asarray(rng.integers(0, C, B))
        out, mids, ffea, feas = r(), (r(), r(), r()), rf(), (rf(), rf(), rf())
        total, aux = losses.sd_total(out, mids, labels, ffea, feas,
                                     alpha=0.1, beta=1e-6, temperature=3.0)
        want = (0.9 * (float(aux["ce"]) + float(aux["mid_ce"].sum()))
                + 0.1 * float(aux["kd"].sum())
                + 1e-6 * float(aux["feat"].sum()))
        np.testing.assert_allclose(float(total), want, rtol=1e-5)
