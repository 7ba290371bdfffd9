"""DPT (dense prediction transformer) monocular depth — the MiDaS model.

The reference generates its ``Depth_Est`` pseudo-depth trees by running
``torch.hub.load("intel-isl/MiDaS", "DPT_Large")`` over every frame
(``preprocess/generate_pseudo_depth_ego.py:15-59``).  This module is the
TPU-native counterpart: DPT-Large in flax (ViT-L/16 backbone, reassemble
taps, RefineNet-style fusion decoder), jittable and BATCHED — the
reference predicts one frame at a time on GPU; here whole clips fold into
one device call.

Weight ingestion — two independent paths:
* ``convert_midas_state_dict`` maps the official MiDaS checkpoint layout
  (``dpt_large-midas-2f21e586.pt``: ``pretrained.model.*`` timm ViT names
  + ``pretrained.act_postprocess{1-4}`` reassemble + ``scratch.*``
  decoder) onto this tree.  The hub download itself is env-blocked here
  (no network egress), so that converter is exercised on a
  synthetically-shaped state dict (``tests/test_dpt.py``).
* ``convert_hf_dpt`` maps ``transformers.DPTForDepthEstimation`` weights
  (``Intel/dpt-large`` ships the same MiDaS weights) — validated against
  the REAL HF module end-to-end (``tests/test_dpt.py`` tiny-config logits
  parity, no network needed).

Architecture (MiDaS v3 ``dpt/models.py`` + ``dpt/vit.py``, public):
* ViT-L/16: patch 16, embed 1024, depth 24, heads 16, learned pos-embed
  (interpolated for non-384 inputs), class token.
* hooks at blocks {5, 11, 17, 23}; readout = "project" (concat cls,
  Linear 2D->D, GELU).
* reassemble: 1x1 conv to {256, 512, 1024, 1024}, then x4 / x2 transpose
  conv / identity / stride-2 conv -> strides {4, 8, 16, 32}.
* scratch: 3x3 no-bias convs to 256; four FeatureFusionBlocks (two
  residual conv units each, align-corners x2 upsample, 1x1 out conv);
  head 3x3->128, x2 up, 3x3->32, ReLU, 1x1->1, ReLU (inverse depth).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def upsample2_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """x2 bilinear upsample with ``align_corners=True`` (torch
    ``interpolate`` semantics — jax.image.resize only does half-pixel)."""

    def up_axis(v: jnp.ndarray, axis: int) -> jnp.ndarray:
        n = v.shape[axis]
        if n == 1:
            return jnp.repeat(v, 2, axis=axis)
        # output position i maps to source coordinate i*(n-1)/(2n-1)
        src = jnp.arange(2 * n) * (n - 1) / (2 * n - 1)
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n - 1)
        w = (src - lo).astype(v.dtype)
        shape = [1] * v.ndim
        shape[axis] = 2 * n
        w = w.reshape(shape)
        return jnp.take(v, lo, axis=axis) * (1 - w) + \
            jnp.take(v, hi, axis=axis) * w

    return up_axis(up_axis(x, 1), 2)


class ViTBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        n, t, _ = q.shape
        hd = self.dim // self.heads
        q = q.reshape(n, t, self.heads, hd)
        k = k.reshape(n, t, self.heads, hd)
        v = v.reshape(n, t, self.heads, hd)
        attn = jnp.einsum("nqhd,nkhd->nhqk", q, k) / jnp.sqrt(
            jnp.asarray(hd, self.dtype))
        attn = jax.nn.softmax(attn, axis=-1)
        o = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, t, self.dim)
        x = x + nn.Dense(self.dim, dtype=self.dtype, name="attn_proj")(o)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(self.mlp_ratio * self.dim, dtype=self.dtype,
                     name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        return x + h


class ResidualConvUnit(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        return x + h


class FeatureFusion(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray = None
                 ) -> jnp.ndarray:
        if skip is not None:
            x = x + ResidualConvUnit(self.features, dtype=self.dtype,
                                     name="res1")(skip)
        x = ResidualConvUnit(self.features, dtype=self.dtype, name="res2")(x)
        x = upsample2_align_corners(x)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       name="out_conv")(x)


class DPT(nn.Module):
    """DPT depth net.  Input ``[N, H, W, 3]`` normalized ((x/255-.5)/.5),
    H and W multiples of 32; output inverse relative depth ``[N, H, W]``."""

    embed_dim: int = 1024
    depth: int = 24
    heads: int = 16
    patch: int = 16
    hooks: Sequence[int] = (5, 11, 17, 23)
    features: int = 256
    reassemble: Sequence[int] = (256, 512, 1024, 1024)
    pos_grid: int = 24                   # pos-embed trained at 384/16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w = x.shape[0], x.shape[1], x.shape[2]
        assert h % 32 == 0 and w % 32 == 0, (h, w)
        gh, gw = h // self.patch, w // self.patch
        x = x.astype(self.dtype)

        p = nn.Conv(self.embed_dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), dtype=self.dtype,
                    name="patch_embed")(x)                  # [N, gh, gw, D]
        tokens = p.reshape(n, gh * gw, self.embed_dim)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 1 + self.pos_grid ** 2, self.embed_dim))
        grid_pos = pos[:, 1:].reshape(1, self.pos_grid, self.pos_grid,
                                      self.embed_dim)
        if (gh, gw) != (self.pos_grid, self.pos_grid):
            grid_pos = jax.image.resize(
                grid_pos, (1, gh, gw, self.embed_dim), "bilinear")
        pos = jnp.concatenate(
            [pos[:, :1], grid_pos.reshape(1, gh * gw, self.embed_dim)],
            axis=1)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (n, 1, self.embed_dim)), tokens], axis=1)
        tokens = tokens + pos.astype(self.dtype)

        taps = {}
        for i in range(self.depth):
            tokens = ViTBlock(self.embed_dim, self.heads, dtype=self.dtype,
                              name=f"block{i}")(tokens)
            if i in self.hooks:
                taps[i] = tokens

        pyramid = []
        for k, hook in enumerate(self.hooks, start=1):
            t = taps[hook]
            readout = jnp.broadcast_to(t[:, :1], t[:, 1:].shape)
            feat = jnp.concatenate([t[:, 1:], readout], axis=-1)
            feat = nn.Dense(self.embed_dim, dtype=self.dtype,
                            name=f"readout{k}")(feat)
            feat = nn.gelu(feat, approximate=False)
            feat = feat.reshape(n, gh, gw, self.embed_dim)
            feat = nn.Conv(self.reassemble[k - 1], (1, 1), dtype=self.dtype,
                           name=f"reassemble{k}")(feat)
            if k == 1:                   # stride 4: x4 transpose conv
                feat = nn.ConvTranspose(
                    self.reassemble[0], (4, 4), strides=(4, 4),
                    padding="VALID", dtype=self.dtype, name="up1")(feat)
            elif k == 2:                 # stride 8: x2 transpose conv
                feat = nn.ConvTranspose(
                    self.reassemble[1], (2, 2), strides=(2, 2),
                    padding="VALID", dtype=self.dtype, name="up2")(feat)
            elif k == 4:                 # stride 32: stride-2 3x3 conv
                feat = nn.Conv(self.reassemble[3], (3, 3), strides=(2, 2),
                               padding=1, dtype=self.dtype, name="down4")(feat)
            feat = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                           dtype=self.dtype, name=f"layer{k}_rn")(feat)
            pyramid.append(feat)

        r1, r2, r3, r4 = pyramid
        path = FeatureFusion(self.features, dtype=self.dtype,
                             name="refinenet4")(r4)
        path = FeatureFusion(self.features, dtype=self.dtype,
                             name="refinenet3")(path, r3)
        path = FeatureFusion(self.features, dtype=self.dtype,
                             name="refinenet2")(path, r2)
        path = FeatureFusion(self.features, dtype=self.dtype,
                             name="refinenet1")(path, r1)

        out = nn.Conv(self.features // 2, (3, 3), padding=1,
                      dtype=self.dtype, name="head_conv1")(path)
        out = upsample2_align_corners(out)
        out = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype,
                      name="head_conv2")(out)
        out = nn.relu(out)
        out = nn.Conv(1, (1, 1), dtype=self.dtype, name="head_conv3")(out)
        out = nn.relu(out)
        return out[..., 0].astype(jnp.float32)


def dpt_large(dtype: Any = jnp.float32) -> DPT:
    """The MiDaS DPT_Large configuration."""
    return DPT(dtype=dtype)


# --- torch checkpoint ingestion ---------------------------------------------

def midas_key_map(cfg: DPT) -> dict:
    """{torch state-dict key -> (flax path tuple, kind)} for the official
    MiDaS DPT layout.  ``kind`` picks the transpose rule:
    'dense' [out,in]->[in,out]; 'conv' OIHW->HWIO; 'tconv' IOHW->HWIO
    (torch ConvTranspose2d weight is [in, out, kh, kw]); 'raw' as-is."""
    m = {}
    P = "pretrained.model."
    m[P + "cls_token"] = (("cls_token",), "raw")
    m[P + "pos_embed"] = (("pos_embed",), "raw")
    m[P + "patch_embed.proj.weight"] = (("patch_embed", "kernel"), "conv")
    m[P + "patch_embed.proj.bias"] = (("patch_embed", "bias"), "raw")
    for i in range(cfg.depth):
        B, b = P + f"blocks.{i}.", (f"block{i}",)
        for tn, fn in (("norm1", "norm1"), ("norm2", "norm2")):
            m[B + tn + ".weight"] = (b + (fn, "scale"), "raw")
            m[B + tn + ".bias"] = (b + (fn, "bias"), "raw")
        m[B + "attn.qkv.weight"] = (b + ("qkv", "kernel"), "dense")
        m[B + "attn.qkv.bias"] = (b + ("qkv", "bias"), "raw")
        m[B + "attn.proj.weight"] = (b + ("attn_proj", "kernel"), "dense")
        m[B + "attn.proj.bias"] = (b + ("attn_proj", "bias"), "raw")
        m[B + "mlp.fc1.weight"] = (b + ("fc1", "kernel"), "dense")
        m[B + "mlp.fc1.bias"] = (b + ("fc1", "bias"), "raw")
        m[B + "mlp.fc2.weight"] = (b + ("fc2", "kernel"), "dense")
        m[B + "mlp.fc2.bias"] = (b + ("fc2", "bias"), "raw")
    up = {1: ("up1", "tconv"), 2: ("up2", "tconv"), 4: ("down4", "conv")}
    for k in range(1, 5):
        A = f"pretrained.act_postprocess{k}."
        m[A + "0.project.0.weight"] = ((f"readout{k}", "kernel"), "dense")
        m[A + "0.project.0.bias"] = ((f"readout{k}", "bias"), "raw")
        m[A + "3.weight"] = ((f"reassemble{k}", "kernel"), "conv")
        m[A + "3.bias"] = ((f"reassemble{k}", "bias"), "raw")
        if k in up:
            name, kind = up[k]
            m[A + "4.weight"] = ((name, "kernel"), kind)
            m[A + "4.bias"] = ((name, "bias"), "raw")
        m[f"scratch.layer{k}_rn.weight"] = \
            ((f"layer{k}_rn", "kernel"), "conv")
        R = f"scratch.refinenet{k}."
        r = (f"refinenet{k}",)
        # refinenet4 is the single-input fusion (no skip): MiDaS creates its
        # resConfUnit1 but never calls it, so the flax tree has no res1
        # there and those torch keys are reported unused.
        units = (("resConfUnit2", "res2"),) if k == 4 else \
            (("resConfUnit1", "res1"), ("resConfUnit2", "res2"))
        for tn, fn in units:
            for c in ("conv1", "conv2"):
                m[R + f"{tn}.{c}.weight"] = (r + (fn, c, "kernel"), "conv")
                m[R + f"{tn}.{c}.bias"] = (r + (fn, c, "bias"), "raw")
        m[R + "out_conv.weight"] = (r + ("out_conv", "kernel"), "conv")
        m[R + "out_conv.bias"] = (r + ("out_conv", "bias"), "raw")
    for tn, fn in (("0", "head_conv1"), ("2", "head_conv2"),
                   ("4", "head_conv3")):
        m[f"scratch.output_conv.{tn}.weight"] = ((fn, "kernel"), "conv")
        m[f"scratch.output_conv.{tn}.bias"] = ((fn, "bias"), "raw")
    return m


def _apply_key_map(state_dict, variables, kmap):
    """Shared conversion loop: walk ``state_dict``, transpose per ``kind``
    ('dense' [out,in]->[in,out]; 'conv' OIHW->HWIO; 'tconv' IOHW->HWIO —
    torch ConvTranspose2d weight is [in, out, kh, kw]; 'raw' as-is), and
    write into a copy of ``variables['params']``.  Returns
    (new_variables, unused_torch_keys)."""
    import numpy as np

    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    unused = []
    for tk, v in state_dict.items():
        if tk not in kmap:
            unused.append(tk)
            continue
        path, kind = kmap[tk]
        arr = np.asarray(v.detach().cpu().numpy()
                         if hasattr(v, "detach") else v)
        if kind == "dense":
            arr = arr.T
        elif kind == "conv":
            arr = arr.transpose(2, 3, 1, 0)
        elif kind == "tconv":
            arr = arr.transpose(2, 3, 0, 1)
        node = params
        for p in path[:-1]:
            node = node[p]
        assert node[path[-1]].shape == arr.shape, \
            (tk, node[path[-1]].shape, arr.shape)
        node[path[-1]] = jnp.asarray(arr)
    return {**variables, "params": params}, unused


def convert_midas_state_dict(state_dict, variables, cfg: DPT = None):
    """Map an official MiDaS DPT state dict onto ``DPT`` variables.
    Returns (new_variables, unused_torch_keys)."""
    cfg = cfg or dpt_large()
    state_dict = {(k[len("module."):] if k.startswith("module.") else k): v
                  for k, v in state_dict.items()}
    return _apply_key_map(state_dict, variables, midas_key_map(cfg))


def hf_dpt_key_map(cfg: DPT) -> dict:
    """{HF ``DPTForDepthEstimation`` state-dict key -> (flax path, kind)}.

    HuggingFace ``Intel/dpt-large`` carries the SAME weights as the MiDaS
    ``dpt_large-midas-2f21e586.pt`` hub checkpoint the reference uses
    (``preprocess/generate_pseudo_depth_ego.py:15``), under
    ``transformers.models.dpt.modeling_dpt`` names — a second, independently
    reachable ingestion path for real pretrained weights.  The q/k/v
    Linears are separate in HF (fused ``qkv`` here); ``convert_hf_dpt``
    pre-fuses them before this 1:1 map applies.  HF's ``dpt.layernorm`` is
    applied only to the final sequence output (modeling_dpt.py
    ``DPTModel.forward``), never to the tapped hidden states the neck
    consumes, so it is correctly reported unused; likewise fusion layer 0's
    ``residual_layer1`` (created, never called — the MiDaS quirk)."""
    m = {}
    E = "dpt.embeddings."
    m[E + "cls_token"] = (("cls_token",), "raw")
    m[E + "position_embeddings"] = (("pos_embed",), "raw")
    m[E + "patch_embeddings.projection.weight"] = \
        (("patch_embed", "kernel"), "conv")
    m[E + "patch_embeddings.projection.bias"] = \
        (("patch_embed", "bias"), "raw")
    for i in range(cfg.depth):
        L, b = f"dpt.encoder.layer.{i}.", (f"block{i}",)
        m[L + "layernorm_before.weight"] = (b + ("norm1", "scale"), "raw")
        m[L + "layernorm_before.bias"] = (b + ("norm1", "bias"), "raw")
        m[L + "layernorm_after.weight"] = (b + ("norm2", "scale"), "raw")
        m[L + "layernorm_after.bias"] = (b + ("norm2", "bias"), "raw")
        m[L + "attention.output.dense.weight"] = \
            (b + ("attn_proj", "kernel"), "dense")
        m[L + "attention.output.dense.bias"] = \
            (b + ("attn_proj", "bias"), "raw")
        m[L + "intermediate.dense.weight"] = (b + ("fc1", "kernel"), "dense")
        m[L + "intermediate.dense.bias"] = (b + ("fc1", "bias"), "raw")
        m[L + "output.dense.weight"] = (b + ("fc2", "kernel"), "dense")
        m[L + "output.dense.bias"] = (b + ("fc2", "bias"), "raw")
    up = {1: ("up1", "tconv"), 2: ("up2", "tconv"), 4: ("down4", "conv")}
    for k in range(1, 5):
        R = f"neck.reassemble_stage.readout_projects.{k - 1}.0."
        m[R + "weight"] = ((f"readout{k}", "kernel"), "dense")
        m[R + "bias"] = ((f"readout{k}", "bias"), "raw")
        A = f"neck.reassemble_stage.layers.{k - 1}."
        m[A + "projection.weight"] = ((f"reassemble{k}", "kernel"), "conv")
        m[A + "projection.bias"] = ((f"reassemble{k}", "bias"), "raw")
        if k in up:
            name, kind = up[k]
            m[A + "resize.weight"] = ((name, "kernel"), kind)
            m[A + "resize.bias"] = ((name, "bias"), "raw")
        m[f"neck.convs.{k - 1}.weight"] = ((f"layer{k}_rn", "kernel"), "conv")
        # fusion_stage.layers[0] consumes the DEEPEST feature (refinenet4)
        F = f"neck.fusion_stage.layers.{4 - k}."
        r = (f"refinenet{k}",)
        units = (("residual_layer2", "res2"),) if k == 4 else \
            (("residual_layer1", "res1"), ("residual_layer2", "res2"))
        for tn, fn in units:
            for tc, fc in (("convolution1", "conv1"), ("convolution2",
                                                       "conv2")):
                m[F + f"{tn}.{tc}.weight"] = (r + (fn, fc, "kernel"), "conv")
                m[F + f"{tn}.{tc}.bias"] = (r + (fn, fc, "bias"), "raw")
        m[F + "projection.weight"] = (r + ("out_conv", "kernel"), "conv")
        m[F + "projection.bias"] = (r + ("out_conv", "bias"), "raw")
    for tn, fn in (("0", "head_conv1"), ("2", "head_conv2"),
                   ("4", "head_conv3")):
        m[f"head.head.{tn}.weight"] = ((fn, "kernel"), "conv")
        m[f"head.head.{tn}.bias"] = ((fn, "bias"), "raw")
    return m


def convert_hf_dpt(state_dict, variables, cfg: DPT = None):
    """Map an HF ``DPTForDepthEstimation`` state dict (e.g.
    ``Intel/dpt-large`` — the same weights as the reference's MiDaS hub
    checkpoint) onto ``DPT`` variables.  Returns
    (new_variables, unused_torch_keys)."""
    import numpy as np

    cfg = cfg or dpt_large()
    sd = {k: np.asarray(v.detach().cpu().numpy()
                        if hasattr(v, "detach") else v)
          for k, v in state_dict.items()}
    # pre-fuse the separate q/k/v Linears into the flax fused-qkv layout:
    # kernel [in, 3*dim] = [q.T | k.T | v.T], bias likewise concatenated
    for i in range(cfg.depth):
        A = f"dpt.encoder.layer.{i}.attention.attention."
        try:
            w = [sd.pop(A + f"{n}.weight") for n in ("query", "key",
                                                     "value")]
            b = [sd.pop(A + f"{n}.bias") for n in ("query", "key", "value")]
        except KeyError as e:  # pragma: no cover - malformed checkpoint
            raise KeyError(f"HF DPT checkpoint missing q/k/v at layer {i}: "
                           f"{e}") from e
        sd[f"__fused_qkv{i}.kernel"] = np.concatenate(
            [x.T for x in w], axis=1)
        sd[f"__fused_qkv{i}.bias"] = np.concatenate(b)
    kmap = hf_dpt_key_map(cfg)
    for i in range(cfg.depth):
        kmap[f"__fused_qkv{i}.kernel"] = \
            ((f"block{i}", "qkv", "kernel"), "raw")
        kmap[f"__fused_qkv{i}.bias"] = ((f"block{i}", "qkv", "bias"), "raw")
    return _apply_key_map(sd, variables, kmap)
