"""Hand-structured VJP for the ACTION gate block (the round-3 prescription).

Round-3 attribution (docs/PERF.md) pinned the training gap: the ACTION
gates add ~75 ms/step of backward traffic at b32 (sg-all ceiling 116
clips/s), ~70% of it the ME branch's ``d(x_shift)`` accumulation — four
consumers of one full-size tensor, each contributing a full-feature-map
gradient that autodiff materializes separately (f32 convert/reduce temps
in the OOM dumps).

This module re-expresses the whole gate block — learnable shift → three
gates → gated sum → wrapped 1x1 conv (reference math
``/root/reference/models/action.py:61-115``) — as ONE ``jax.custom_vjp``
region whose backward:

* saves only the block INPUT plus the (small) gate activations as
  residuals — ``x_shift`` and ``gated`` (two full-size tensors autodiff
  keeps alive) are recomputed from the input in the backward, turning
  residual HBM round-trips into VPU FMAs;
* accumulates all four ``d(x_shift)`` contributions in one fused
  expression (gated-product term + STE/CE broadcast terms + the ME
  squeeze-matmul term), so XLA sees a single consumer tree instead of
  four independent full-size adds;
* keeps the small-net sub-gradients (STE 3³ conv, CE squeeze/T-conv/
  expand, ME BN/depthwise/expand) on ``jax.vjp`` of the exact forward
  segments — hand-structuring the traffic, not hand-deriving every
  kernel.

Forward math is kept bit-identical to the XLA formulation in
``ehgr_tpu.ops.action.ActionConv`` (same primitives, same dtype casts,
same op order), so golden-logit and parity tests hold in either mode.
Enabled per-model with ``action_fused='vjp'``; measured on the chip by
``tools/bench_action_vjp.py`` (results: docs/PERF.md round 4).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax

from ehgr_tpu.ops.temporal_shift import learnable_shift

_STE_DN = ("NDHWC", "DHWIO", "NDHWC")
_CE_DN = ("NWC", "WIO", "NWC")
_DW_DN = ("NHWC", "HWIO", "NHWC")


def _bn_fold(x, scale, bias, mean, var, eps, dt):
    """norm.py's folded affine apply, replicated exactly."""
    a = scale * lax.rsqrt(var + eps)
    b = bias - mean * a
    return (x.astype(dt) * a.astype(dt) + b.astype(dt)).astype(dt)


def _gates_from_stats(p1in, pooled, x3r, p, *, bn_train, eps, dt):
    """Gate heads from the three x_shift reductions.  Segment boundaries
    chosen so the backward can ``jax.vjp`` this whole function on SMALL
    tensors only (p1in is 1/C of full size, x3r is 1/16, pooled is tiny).

    Returns (g1, g2, g3, bn_mean, bn_var)."""
    # STE (ref action.py:39-41,76-83)
    p1 = lax.conv_general_dilated(p1in, p["k_p1"].astype(dt), (1, 1, 1),
                                  "SAME", dimension_numbers=_STE_DN)
    g1 = jax.nn.sigmoid(p1)                              # [N,T,H,W,1]

    # CE (ref action.py:43-48,85-96)
    ce = jnp.dot(pooled, p["w_sq"].astype(dt))           # [N,T,Cr]
    ce = lax.conv_general_dilated(ce, p["k_ce"].astype(dt), (1,), "SAME",
                                  dimension_numbers=_CE_DN)
    ce = jax.nn.relu(ce)
    g2 = jax.nn.sigmoid(jnp.dot(ce, p["w_exp"].astype(dt)))   # [N,T,C]

    # ME (ref action.py:51-58,98-113); x3r: [N,T,H,W,Cr] pre-BN
    n, t, h, w, cr = x3r.shape
    if bn_train:
        xf = x3r.astype(jnp.float32)
        bn_mean = jnp.mean(xf, axis=(0, 1, 2, 3))
        bn_var = jnp.maximum(
            jnp.mean(jnp.square(xf), axis=(0, 1, 2, 3))
            - jnp.square(bn_mean), 0.0)
    else:
        bn_mean, bn_var = p["bn_mean"], p["bn_var"]
    x3 = _bn_fold(x3r, p["bn_scale"], p["bn_bias"], bn_mean, bn_var,
                  eps, dt)
    x3c = lax.conv_general_dilated(
        x3.reshape(n * t, h, w, cr), p["k_dw"].astype(dt), (1, 1), "SAME",
        dimension_numbers=_DW_DN,
        feature_group_count=cr).reshape(n, t, h, w, cr)
    diff = x3c[:, 1:] - x3[:, :-1]
    diff = jnp.concatenate([diff, jnp.zeros_like(diff[:, :1])], axis=1)
    p3m = jnp.mean(diff, axis=(2, 3))                    # [N,T,Cr]
    g3 = jax.nn.sigmoid(jnp.dot(p3m, p["w_me"].astype(dt)))   # [N,T,C]
    return g1, g2, g3, bn_mean, bn_var


def make_action_region(*, bn_train: bool, dtype, eps: float = 1e-5):
    """Build the custom-VJP gate-block function for one static config.

    ``region(x5, p) -> (out_nt, bn_mean, bn_var)`` where ``x5`` is the
    module input ``[N,T,H,W,C]`` and ``p`` the flat param dict (f32, cast
    to ``dtype`` inside — exactly like the module path)."""
    dt = dtype

    def _stats(x5, p):
        """x_shift + its three reductions (the full-size fan-out)."""
        s = learnable_shift(x5, p["shift_w"].astype(dt))
        p1in = jnp.mean(s, axis=-1, keepdims=True)       # [N,T,H,W,1]
        pooled = jnp.mean(s, axis=(2, 3))                # [N,T,C]
        n, t, h, w, c = x5.shape
        x3r = jnp.dot(s.reshape(-1, c), p["w_p3"].astype(dt),
                      preferred_element_type=jnp.float32)
        x3r = x3r.reshape(n, t, h, w, c // 16).astype(dt)
        return s, p1in, pooled, x3r

    def _apply(s, g1, g2, g3, w_net):
        """Gated sum + wrapped conv, op order as the module path."""
        n, t, h, w, c = s.shape
        gated = s * (g1 + g2[:, :, None, None, :] +
                     g3[:, :, None, None, :]) + 3.0 * s
        out = jnp.dot(gated.reshape(-1, c), w_net.astype(dt),
                      preferred_element_type=jnp.float32)
        return out.reshape(n * t, h, w, -1).astype(dt)

    @jax.custom_vjp
    def region(x5, p):
        s, p1in, pooled, x3r = _stats(x5, p)
        g1, g2, g3, m, v = _gates_from_stats(
            p1in, pooled, x3r, p, bn_train=bn_train, eps=eps, dt=dt)
        return _apply(s, g1, g2, g3, p["w_net"]), m, v

    def fwd(x5, p):
        s, p1in, pooled, x3r = _stats(x5, p)
        g1, g2, g3, m, v = _gates_from_stats(
            p1in, pooled, x3r, p, bn_train=bn_train, eps=eps, dt=dt)
        out = _apply(s, g1, g2, g3, p["w_net"])
        # residuals: input + small tensors only — x_shift and gated are
        # recomputed in bwd (the structural win vs autodiff)
        return (out, m, v), (x5, p, p1in, pooled, x3r, g1, g2, g3)

    def bwd(res, cot):
        d_out = cot[0].astype(dt)           # bn-stat cotangents unused
        x5, p, p1in, pooled, x3r, g1, g2, g3 = res
        n, t, h, w, c = x5.shape
        rows = n * t * h * w

        # recompute x_shift (3 VPU FMAs off the saved input)
        s = learnable_shift(x5, p["shift_w"].astype(dt))
        gsum = g1 + g2[:, :, None, None, :] + g3[:, :, None, None, :]

        # wrapped-conv backward: d_gated, d_w_net
        d_out2 = d_out.reshape(rows, -1)
        gated = (s * gsum + 3.0 * s).reshape(rows, c)
        d_w_net = jnp.dot(gated.T, d_out2,
                          preferred_element_type=jnp.float32)
        d_gated = jnp.dot(d_out2, p["w_net"].astype(dt).T,
                          preferred_element_type=jnp.float32
                          ).astype(dt).reshape(s.shape)

        # gate cotangents: one shared full-size product, reduced two ways
        dg_full = s * d_gated
        dg1 = jnp.sum(dg_full, axis=-1, keepdims=True)   # [N,T,H,W,1]
        dg_ch = jnp.sum(dg_full, axis=(2, 3))            # [N,T,C] (g2 & g3)

        # small-net backward: exact segment VJP on small tensors
        gates_fn = partial(_gates_from_stats, bn_train=bn_train, eps=eps,
                           dt=dt)
        _, seg_vjp = jax.vjp(
            lambda p1i, pl, x3, q: gates_fn(
                p1i, pl, x3, {**p, **q})[:3],
            p1in, pooled, x3r,
            {k: p[k] for k in ("k_p1", "w_sq", "k_ce", "w_exp", "bn_scale",
                               "bn_bias", "k_dw", "w_me")})
        d_p1in, d_pooled, d_x3r, d_small = seg_vjp((dg1, dg_ch, dg_ch))

        # the ME squeeze-matmul transpose (the dominant term, round 3)
        d_x3r2 = d_x3r.astype(dt).reshape(rows, c // 16)
        d_w_p3 = jnp.dot(s.reshape(rows, c).T, d_x3r2,
                         preferred_element_type=jnp.float32)

        # ONE fused accumulation of all four d(x_shift) contributions
        d_s = ((gsum + 3.0) * d_gated
               + d_p1in.astype(dt) / c
               + (d_pooled.astype(dt) / (h * w))[:, :, None, None, :]
               + jnp.dot(d_x3r2, p["w_p3"].astype(dt).T,
                         preferred_element_type=jnp.float32
                         ).astype(dt).reshape(s.shape))

        # learnable-shift transpose (exact segment VJP; 3 taps)
        _, shift_vjp = jax.vjp(
            lambda x, sw: learnable_shift(x, sw.astype(dt)),
            x5, p["shift_w"])
        d_x5, d_shift_w = shift_vjp(d_s)

        d_p = dict(d_small,
                   shift_w=d_shift_w,
                   w_p3=d_w_p3.astype(p["w_p3"].dtype),
                   w_net=d_w_net.astype(p["w_net"].dtype))
        for k in ("bn_mean", "bn_var"):
            d_p[k] = jnp.zeros_like(p[k])
        return d_x5, d_p

    region.defvjp(fwd, bwd)
    return region


def region_params(raw: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Adapt the module's raw param arrays to the region's flat contract
    (squeezing the 1x1 conv kernels to plain matrices)."""
    out = dict(raw)
    out["w_p3"] = raw["w_p3"][0, 0]
    out["w_net"] = raw["w_net"][0, 0]
    return out
