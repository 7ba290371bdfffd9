"""ACTION temporal module (flax), NHWC / explicit-T design.

Reference: ``/root/reference/models/action.py:8-116`` — a wrapper around a
bottleneck's 1x1 ``conv1`` adding (1) a learnable temporal shift, (2) three
multiplicative excitation gates (spatial-temporal, channel, motion), then the
wrapped conv on the gated sum.

TPU re-design notes (vs the reference's NT<->(N,T) "reshape dance",
``action.py:61-73``):

* Input stays ``[N, T, H, W, C]`` — no permutes; the shift is three fused
  multiply-adds on the VPU (``ehgr_tpu.ops.temporal_shift.learnable_shift``),
  not a grouped Conv1d over a ``[N*H*W, C, T]`` view.
* The channel/motion "squeeze" 1x1 convs on pooled ``[N, T, C]`` tensors are
  plain Dense matmuls — MXU-friendly, no degenerate 1x1 spatial dims.
* Everything is shape-static so XLA fuses gates into the surrounding convs.

Gate math replicated exactly:
  x_shift = learnable_shift(x)                                (ref :65-73)
  STE: sigmoid(conv3d_3x3x3(mean_c(x_shift)))                 (ref :77-83)
  CE : sigmoid(expand(relu(conv1d_T(squeeze(gap(x_shift)))))) (ref :86-96)
  ME : sigmoid(expand(gap(pad_T(dwconv3x3(x)[1:] - x[:-1])))) (ref :99-113)
  out = net(sum_i (x_shift * gate_i + x_shift))               (ref :115)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ehgr_tpu.models.norm import BatchNorm

from ehgr_tpu.ops.temporal_shift import learnable_shift, tsm_shift_init


class _Kernel1x1(nn.Module):
    """Bare conv-kernel param holder: keeps the ('<name>', 'kernel') tree
    path of an nn.Conv while letting callers use the array directly."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape)


class _BNVars(nn.Module):
    """Bare BatchNorm param/stat holder mirroring ``models.norm.BatchNorm``'s
    tree (``scale``/``bias`` params + ``batch_stats/{mean,var}``) so the
    custom-VJP path keeps checkpoint-identical trees."""

    feat: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.feat,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.feat,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.feat,), jnp.float32))
        return scale, bias, ra_mean, ra_var


def _shift_zero(x: jnp.ndarray, axis: int, d: int) -> jnp.ndarray:
    """``out[i] = x[i+d]`` along ``axis``, zero-filled at the edges (the
    'SAME' zero-padding convention of torch/lax convs)."""
    if d == 0:
        return x
    pad = [(0, 0)] * x.ndim
    sl = [slice(None)] * x.ndim
    if d > 0:
        pad[axis] = (0, d)
        sl[axis] = slice(d, None)
    else:
        pad[axis] = (-d, 0)
        sl[axis] = slice(None, d)
    return jnp.pad(x[tuple(sl)], pad)


def ste_conv3d(p1: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """The STE branch's 3x3x3 single-channel 'SAME' conv on ``[N,T,H,W,1]``
    (ref ``action.py:77-83``) as 27 shifted multiply-adds.

    Why not ``lax.conv``: a 1-in/1-out-channel conv occupies one of the
    TPU's 128 lanes and pads the rest.  Measured in the full MTMM train step
    the swap is NEUTRAL (345 vs 350 ms at b32 — XLA's lowering was already
    tolerable; per-gate stop-grad attribution put the whole STE backward at
    ~8 ms, docs/PERF.md round 3); kept as default because it is exactly
    equal math (correlation, zero pad) with no degenerate-channel lowering
    to depend on: each tap is a slice+pad the compiler fuses into the FMA
    chain, and its autodiff transpose is the mirrored stencil.
    ``k``: ``[3,3,3,1,1]`` (DHWIO, torch Conv3d weight transposed as usual).
    """
    m = p1[..., 0]                                     # [N, T, H, W]
    out = jnp.zeros_like(m)
    for a in range(3):
        md = _shift_zero(m, 1, a - 1)
        for b in range(3):
            mh = _shift_zero(md, 2, b - 1)
            for cc in range(3):
                out = out + k[a, b, cc, 0, 0] * _shift_zero(mh, 3, cc - 1)
    return out[..., None]


def depthwise_conv3x3(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """The ME branch's 3x3 'SAME' depthwise conv on ``[NT,H,W,Cr]`` (ref
    ``action.py:51-54``) as 9 per-channel shifted multiply-adds.

    Why not ``nn.Conv(feature_group_count=Cr)``: grouped convs with tiny
    channel counts depend on a lowering TPU handles poorly in general.
    Measured in the full MTMM train step the swap is NEUTRAL (104.1 vs
    102.6 clips/s at b16, 88.8 vs 91.3 at b32 — the ME backward's ~52 ms,
    found by stop-grad attribution, is the x_shift gradient-accumulation
    traffic, not this conv; docs/PERF.md round 3).  Kept as default for the
    same reason as ``ste_conv3d``: exactly equal math with no grouped
    lowering anywhere — 9 slice+pad taps fused into an FMA chain with
    per-channel weights broadcast on the lane axis.
    ``k``: ``[3,3,1,Cr]`` (flax HWIO grouped layout — same tree entry)."""
    out = jnp.zeros_like(x)
    for b in range(3):
        xh = _shift_zero(x, 1, b - 1)
        for cc in range(3):
            out = out + k[b, cc, 0] * _shift_zero(xh, 2, cc - 1)
    return out


# A/B switch for perf tooling (tools/bench_train_sweep.py monkeypatches);
# True = shifted-FMA stencil, False = lax.conv_general_dilated.
# Defaults measured on the chip (tools/bench_stencil_ab.py, b384 inference):
# conv forms 470.3 clips/s vs stencil forms 427.9 (DW stencil −38, STE −6);
# train step neutral either way — so conv lowerings are the defaults.
STE_STENCIL = False

# Same switch for the ME depthwise conv (stencil vs grouped nn.Conv)
DW_STENCIL = False

# Backward-attribution knob (perf tooling only — tools/bench_train_sweep.py):
# gate names placed here get jax.lax.stop_gradient, so their FORWARD cost
# stays while their backward disappears; never set in production code.
SG_GATES: frozenset = frozenset()


def _maybe_sg(g: jnp.ndarray, name: str) -> jnp.ndarray:
    return jax.lax.stop_gradient(g) if name in SG_GATES else g


class ActionConv(nn.Module):
    """ACTION wrapper owning the conv it feeds (the reference's ``net``).

    Attributes mirror the reference ctor (``action.py:9-23``): ``features`` is
    the wrapped conv's out-channels, ``n_segment`` = T, ``shift_div`` the TSM
    fold divisor.  ``bn_frozen`` freezes the ME branch BN (the effective
    reference behavior under partial-BN; see SURVEY.md §2.2 notes).
    """

    features: int
    n_segment: int
    shift_div: int = 8
    bn_frozen: bool = True
    dtype: jnp.dtype = jnp.float32
    # Kernel mode:
    #   None / False / 'none' — pure XLA (fusion decided by the compiler)
    #   'vjp'                 — custom-VJP gate block AT TRAIN ONLY (fast
    #                           fused backward, ops/action_vjp.py); eval
    #                           falls through to the pure-XLA path, so the
    #                           inference program is byte-identical to
    #                           'none' (no 9%-regression risk, docs/PERF.md
    #                           round-3 stencil lesson).  Default via
    #                           ModelConfig (ADVICE r4).
    #   True / 'prologue'     — one-pass gate-stats kernel, x_shift still
    #                           materialized (ops/pallas/action_fused.py);
    #                           measured SLOWER in-model, kept as verified
    #                           infrastructure (docs/PERF.md)
    #   'mega'                — two-sweep megakernel: stats sweep + fused
    #                           gates/gated-sum/wrapped-conv sweep; x_shift
    #                           never touches HBM (ops/pallas/action_mega.py)
    fused: object = None
    # int8 MXU path for the wrapped 1x1 conv (ops/quantize.py semantics):
    # False | 'static' | 'calib'.  Gate math stays float (parity-sensitive
    # sigmoids); eval-only — training and the mega path ignore it.
    quantize: object = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        nt, h, w, c = x.shape
        n = nt // self.n_segment
        t = self.n_segment
        reduced = c // 16

        x5 = x.reshape(n, t, h, w, c)

        # --- params shared by every path (same tree entries regardless of
        # kernel mode, so checkpoints and torch_import are mode-agnostic) ---
        # (1) learnable temporal shift taps, TSM-initialized (ref :25-36)
        shift_w = self.param(
            "shift_w",
            lambda key, shape: tsm_shift_init(c, self.shift_div), (3, c))
        # ME squeeze / STE conv3d / wrapped-conv kernels as raw params (the
        # ('<name>', 'kernel') paths an nn.Conv would create)
        w_p3 = _Kernel1x1((1, 1, c, reduced), name="p3_squeeze")()
        k_p1 = _Kernel1x1((3, 3, 3, 1, 1), name="p1_conv")()
        w_net = (_Kernel1x1((1, 1, c, self.features), name="net")()
                 if self.features else None)

        mode = {None: "none", False: "none", True: "prologue"}.get(
            self.fused, self.fused)
        use_mega = mode == "mega" and not train and self.features > 0
        use_prologue = mode == "prologue" and not train

        if mode == "vjp" and train and self.features > 0 \
                and not self.quantize:
            # Hand-structured custom-VJP gate block (training backward
            # optimization, docs/PERF.md round 4): identical forward math,
            # backward recomputes x_shift/gated and fuses the four
            # d(x_shift) contributions into one expression.  Param tree
            # mirrors the submodule formulation exactly (same paths/inits),
            # so checkpoints are mode-agnostic.
            from ehgr_tpu.ops.action_vjp import (make_action_region,
                                                 region_params)

            w_sq = _Kernel1x1((c, reduced), name="p2_squeeze")()
            k_ce = _Kernel1x1((3, reduced, reduced), name="p2_conv1")()
            w_exp = _Kernel1x1((reduced, c), name="p2_expand")()
            k_dw = _Kernel1x1((3, 3, 1, reduced), name="p3_conv1")()
            w_me = _Kernel1x1((reduced, c), name="p3_expand")()
            scale, bias, ra_mean, ra_var = _BNVars(reduced, name="p3_bn1")()
            bn_train = train and not self.bn_frozen
            region = make_action_region(bn_train=bn_train, dtype=self.dtype)
            params = region_params(dict(
                shift_w=shift_w, w_p3=w_p3, k_p1=k_p1, w_net=w_net,
                w_sq=w_sq, k_ce=k_ce, w_exp=w_exp, k_dw=k_dw, w_me=w_me,
                bn_scale=scale, bn_bias=bias,
                bn_mean=ra_mean.value, bn_var=ra_var.value))
            out, m, v = region(x5, params)
            if bn_train and not self.is_initializing():
                # torch's unbiased running-var update (models/norm.py)
                cnt = nt * h * w
                corr = cnt / max(cnt - 1, 1)
                mom = 0.9
                m = jax.lax.stop_gradient(m)
                v = jax.lax.stop_gradient(v)
                ra_mean.value = mom * ra_mean.value + (1.0 - mom) * m
                ra_var.value = mom * ra_var.value + (1.0 - mom) * (v * corr)
            return out

        g1 = x_shift5 = None
        if use_mega:
            from ehgr_tpu.ops.pallas.action_mega import (action_stats,
                                                         ste_stencil)

            # flattened-spatial layout for the kernels (free reshape)
            x4 = x5.reshape(n, t, h * w, c)
            mc, pooled, x3_4 = action_stats(
                x4, shift_w.astype(self.dtype), w_p3[0, 0].astype(self.dtype))
            x3 = x3_4.reshape(nt, h, w, reduced)
            # (2) STE as a 27-tap stencil on the [N,T,H,W] mean map
            g1_map = nn.sigmoid(ste_stencil(
                mc.reshape(n, t, h, w),
                k_p1[..., 0, 0].astype(self.dtype)))          # [N,T,H,W]
        else:
            if use_prologue:
                from ehgr_tpu.ops.pallas.action_fused import (
                    action_fused_prologue)

                x_shift5, p1, pooled, x3_5 = action_fused_prologue(
                    x5, shift_w.astype(self.dtype),
                    w_p3[0, 0].astype(self.dtype))
                x3 = x3_5.reshape(nt, h, w, reduced)
            else:
                x_shift5 = learnable_shift(x5, shift_w.astype(self.dtype))
                p1 = jnp.mean(x_shift5, axis=-1, keepdims=True)  # [N,T,H,W,1]
                pooled = jnp.mean(x_shift5, axis=(2, 3))         # [N,T,C]
                x_shift_nt = x_shift5.reshape(nt, h, w, c)
                x3 = jnp.dot(x_shift_nt.reshape(-1, c),
                             w_p3[0, 0].astype(self.dtype),
                             preferred_element_type=jnp.float32)
                x3 = x3.reshape(nt, h, w, reduced).astype(self.dtype)

            # (2) STE — spatial-temporal excitation (ref :39-41, 76-83)
            if STE_STENCIL:
                p1 = ste_conv3d(p1, k_p1.astype(self.dtype))
            else:
                p1 = jax.lax.conv_general_dilated(
                    p1, k_p1.astype(self.dtype), (1, 1, 1), "SAME",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            g1 = _maybe_sg(nn.sigmoid(p1), "ste")             # [N,T,H,W,1]

        # (3) CE — channel excitation (ref :43-48, 85-96)
        p2 = nn.Dense(reduced, use_bias=False, dtype=self.dtype,
                      name="p2_squeeze")(pooled)              # [N,T,Cr]
        p2 = nn.Conv(reduced, (3,), use_bias=False, padding="SAME",
                     dtype=self.dtype, name="p2_conv1")(p2)   # conv over T
        p2 = nn.relu(p2)
        p2 = nn.Dense(c, use_bias=False, dtype=self.dtype,
                      name="p2_expand")(p2)                   # [N,T,C]
        g2 = _maybe_sg(nn.sigmoid(p2), "ce")                  # [N,T,C]

        # (4) ME — motion excitation (ref :51-58, 98-113); consumes x_shift
        x3 = BatchNorm(use_running_average=(not train) or self.bn_frozen,
                          momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                          name="p3_bn1")(x3)
        if DW_STENCIL:
            k_p3c = _Kernel1x1((3, 3, 1, reduced), name="p3_conv1")()
            x3c = depthwise_conv3x3(x3, k_p3c.astype(self.dtype))
        else:
            x3c = nn.Conv(reduced, (3, 3), use_bias=False, padding="SAME",
                          feature_group_count=reduced, dtype=self.dtype,
                          name="p3_conv1")(x3)                # depthwise
        x3_5 = x3.reshape(n, t, h, w, reduced)
        x3c_5 = x3c.reshape(n, t, h, w, reduced)
        diff = x3c_5[:, 1:] - x3_5[:, :-1]                    # [N,T-1,...]
        diff = jnp.concatenate(
            [diff, jnp.zeros_like(diff[:, :1])], axis=1)      # pad last frame
        p3 = jnp.mean(diff, axis=(2, 3))                      # [N,T,Cr]
        p3 = nn.Dense(c, use_bias=False, dtype=self.dtype,
                      name="p3_expand")(p3)
        g3 = _maybe_sg(nn.sigmoid(p3), "me")                  # [N,T,C]

        if use_mega:
            from ehgr_tpu.ops.pallas.action_mega import action_apply

            # gated sum + wrapped 1x1 conv in one sweep:
            # x_shift * (g1 + g2 + g3 + 3) @ w_net  (ref :83,96,113,115)
            gch = (g2 + g3 + 3.0).astype(self.dtype)          # [N,T,C]
            out = action_apply(x4, shift_w.astype(self.dtype),
                               g1_map.reshape(n, t, h * w, 1), gch,
                               w_net[0, 0].astype(self.dtype))
            return out.reshape(nt, h, w, self.features)

        # gated sum: each branch is x_shift * g + x_shift  (ref :83,96,113,115)
        gated = x_shift5 * (g1 + g2[:, :, None, None, :] +
                            g3[:, :, None, None, :]) + 3.0 * x_shift5
        gated = gated.reshape(nt, h, w, c)

        if self.features == 0:     # gate-only mode (ActionGate)
            return gated
        qmode = self.quantize if (self.quantize in ("static", "calib")
                                  and not train) else None
        if qmode:
            from ehgr_tpu.ops.quantize import (quantize_activation,
                                               quantize_weight)

            act_scale = self.variable("quant", "act_scale",
                                      lambda: jnp.zeros((), jnp.float32))
            if qmode == "calib":
                if not self.is_initializing() and \
                        self.is_mutable_collection("quant"):
                    amax = jnp.max(jnp.abs(gated.astype(jnp.float32)))
                    act_scale.value = jnp.maximum(act_scale.value,
                                                  amax / 127.0)
            else:                               # static int8 MXU matmul
                wq, ws = quantize_weight(w_net[0, 0][None, None])
                xs = jnp.maximum(act_scale.value, 1e-12)
                xq = jnp.clip(jnp.round(
                    gated.reshape(-1, c).astype(jnp.float32) / xs),
                    -127, 127).astype(jnp.int8)
                out = jnp.dot(xq, wq[0, 0],
                              preferred_element_type=jnp.int32)
                out = (out.astype(jnp.float32) * (xs * ws))
                return out.reshape(nt, h, w,
                                   self.features).astype(self.dtype)
        out = jnp.dot(gated.reshape(-1, c), w_net[0, 0].astype(self.dtype),
                      preferred_element_type=jnp.float32)
        return out.reshape(nt, h, w, self.features).astype(self.dtype)


def ActionGate(n_segment: int, shift_div: int = 8, bn_frozen: bool = False,
               dtype=jnp.float32, name: str = None) -> "ActionConv":
    """ACTION gating WITHOUT a wrapped conv (channel-preserving gated sum).

    Used at BNInception block entries where the reference's 10
    ``shift_2..shift_5a`` wrappers sit (``archs/bn_inception_action.py:
    154-167``) — its own temporal-forward wiring is dead code (pdb landmines
    at :227-242), so this is the sane block-input formulation of the same
    capability."""
    return ActionConv(features=0, n_segment=n_segment, shift_div=shift_div,
                      bn_frozen=bn_frozen, dtype=dtype, name=name)


class TSMConv(nn.Module):
    """Plain TSM wrapper: zero-pad channel shift then the wrapped 1x1 conv
    (ref ``temporal_shift.py:119-154``)."""

    features: int
    n_segment: int
    shift_div: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from ehgr_tpu.ops.temporal_shift import temporal_shift

        nt, h, w, c = x.shape
        x5 = x.reshape(nt // self.n_segment, self.n_segment, h, w, c)
        x5 = temporal_shift(x5, self.shift_div)
        x = x5.reshape(nt, h, w, c)
        return nn.Conv(self.features, (1, 1), use_bias=False,
                       dtype=self.dtype, name="net")(x)
