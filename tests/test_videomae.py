"""VideoMAE flax model tests: shapes, tiny-geometry training signal, and the
HF name-mapping converter (synthetic HF-shaped state_dict)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from ehgr_tpu.models.videomae import VideoMAE, convert_hf_videomae, sincos_pos_embed

CLS = 7


def tiny_model():
    return VideoMAE(num_class=CLS, dim=32, depth=2, heads=4,
                    tubelet=2, patch=8)


class TestVideoMAE:
    def test_logits_shape(self):
        model = tiny_model()
        x = jnp.zeros((2, 4, 32, 32, 3), jnp.float32)
        v = model.init({"params": jax.random.key(0)}, x, train=False)
        out = model.apply(v, x, train=False)
        assert out.shape == (2, CLS)

    def test_pos_embed_properties(self):
        p = sincos_pos_embed(10, 16)
        assert p.shape == (10, 16)
        assert np.all(np.abs(p) <= 1.0 + 1e-6)

    def test_grad_flows(self, rng):
        model = tiny_model()
        x = jnp.asarray(rng.standard_normal((1, 4, 32, 32, 3)), jnp.float32)
        v = model.init({"params": jax.random.key(0)}, x, train=False)
        g = jax.grad(lambda p: jnp.sum(
            model.apply({"params": p}, x, train=False) ** 2))(v["params"])
        leaf = jax.tree.leaves(g)[0]
        assert np.isfinite(np.asarray(leaf).sum())

    def test_hf_converter_names(self):
        model = tiny_model()
        x = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
        variables = model.init({"params": jax.random.key(0)}, x, train=False)

        g = torch.Generator().manual_seed(0)
        dim, mlp = 32, 128
        sd = {"videomae.embeddings.patch_embeddings.projection.weight":
              torch.randn(dim, 3, 2, 8, 8, generator=g),
              "videomae.embeddings.patch_embeddings.projection.bias":
              torch.randn(dim, generator=g),
              "fc_norm.weight": torch.ones(dim),
              "fc_norm.bias": torch.zeros(dim),
              "classifier.weight": torch.randn(CLS, dim, generator=g),
              "classifier.bias": torch.zeros(CLS)}
        for i in range(2):
            L = f"videomae.encoder.layer.{i}"
            sd[f"{L}.layernorm_before.weight"] = torch.ones(dim)
            sd[f"{L}.layernorm_before.bias"] = torch.zeros(dim)
            sd[f"{L}.layernorm_after.weight"] = torch.ones(dim)
            sd[f"{L}.layernorm_after.bias"] = torch.zeros(dim)
            sd[f"{L}.attention.attention.query.weight"] = torch.randn(
                dim, dim, generator=g)
            sd[f"{L}.attention.attention.query.bias"] = torch.zeros(dim)
            sd[f"{L}.attention.attention.key.weight"] = torch.randn(
                dim, dim, generator=g)
            sd[f"{L}.attention.attention.value.weight"] = torch.randn(
                dim, dim, generator=g)
            sd[f"{L}.attention.attention.value.bias"] = torch.zeros(dim)
            sd[f"{L}.attention.output.dense.weight"] = torch.randn(
                dim, dim, generator=g)
            sd[f"{L}.attention.output.dense.bias"] = torch.zeros(dim)
            sd[f"{L}.intermediate.dense.weight"] = torch.randn(
                mlp, dim, generator=g)
            sd[f"{L}.intermediate.dense.bias"] = torch.zeros(mlp)
            sd[f"{L}.output.dense.weight"] = torch.randn(
                dim, mlp, generator=g)
            sd[f"{L}.output.dense.bias"] = torch.zeros(dim)

        new_vars, missing = convert_hf_videomae(sd, variables)
        assert missing == [], missing
        k = new_vars["params"]["patch_embed"]["kernel"]
        np.testing.assert_allclose(
            np.asarray(k),
            sd["videomae.embeddings.patch_embeddings.projection.weight"]
            .numpy().transpose(2, 3, 4, 1, 0))
