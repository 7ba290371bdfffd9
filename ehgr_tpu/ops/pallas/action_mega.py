"""ACTION megakernel: the two-sweep fusion of the whole ACTION site.

Reference module being fused: ``/root/reference/models/action.py:61-116``
(learnable shift -> STE/CE/ME gates -> gated sum -> wrapped 1x1 conv).

Why two sweeps (docs/PERF.md round-2 plan): the gates depend on *global*
reductions of ``x_shift`` (channel mean, spatial pool, squeeze matmul), so no
single pass can both compute and apply them.  The XLA formulation pays ~5
full-tensor HBM passes per site (shift materialization + one read per gate
consumer + gated-sum write + conv read); this pair of kernels pays exactly
two reads of ``x`` and one write of the conv output:

  sweep 1  ``action_stats``  — read ``x`` once; compute the 3-tap shift
      on the fly in VMEM (never materialized in HBM) and emit the three
      gate statistics:
        mc     [N,T,S,1]   channel mean of x_shift      (STE input)
        pool   [N,T,C]     spatial sum of x_shift       (CE input)
        x3     [N,T,S,Cr]  x_shift @ W_p3, Cr = C/16    (ME squeeze)
  (tiny XLA middle: STE stencil + CE MLP + ME tail -> per-pixel gate g1
      and per-channel gate gch = g2 + g3 + 3)
  sweep 2  ``action_apply``  — read ``x`` again, recompute the shift,
      apply ``x_shift * (g1 + gch)`` and the wrapped 1x1 conv as one MXU
      matmul per slab, writing only the conv output.

Layout: spatial dims are FLATTENED to ``S = H*W`` before the kernels — the
shift, gates, and 1x1 matmul are all pointwise over space, so the kernels
tile ``[N, T, S, C]`` slabs with an 8-aligned S tile and the whole T axis
resident in VMEM (the three shift taps are then VMEM-local FMAs).  Only the
STE stencil needs the H/W structure, and it runs in XLA on the tiny
``[N,T,H,W]`` mean map.  This sidesteps the Mosaic block-shape constraint
(second-to-last block dim must be 8-aligned or full) that an ``[N,T,H,W,C]``
row tiling hits at 28^2/14^2/7^2 feature maps.

Forward-only (inference fast path): ``ActionConv(fused='mega')`` uses it when
``train=False``; training takes the XLA formulation (autodiff).  Parity with
the XLA path is enforced by ``tests/test_action_mega.py``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _s_tile(t: int, s: int, c: int, itemsize: int, out_cols: int,
            budget: int = 12 << 20) -> int:
    """S tile for a ``[1, t, st, c]`` slab under the ~16 MB scoped-VMEM
    limit: the whole S when the estimated footprint fits ``budget``, else
    the largest 8-aligned DIVISOR of S that fits (no partial blocks -> no
    masking), else the largest 8-aligned tile that fits (the grid then uses
    ``pl.cdiv`` and the final partial block is masked where it matters).

    The per-S-row cost model counts what the naive element count misses:
    double-buffered input, LANE-PADDED outputs (a 1- or 17-column output
    still occupies 128 lanes), and the f32 matmul intermediate — the
    C=64 layer1 site otherwise picks a tile whose padded outputs blow the
    16 MB stack (measured: 18.4 MB at st=1568)."""
    lane = 128
    pad_out = (max(out_cols, 1) + lane - 1) // lane * lane
    per_row = t * (itemsize * (2 * c + 4 * lane + 2 * pad_out)
                   + 4 * (pad_out + lane))
    if s * per_row <= budget or s < 8:
        return s
    cap = max(8, budget // per_row // 8 * 8)              # multiple of 8
    for d in range(cap, 7, -8):
        if s % d == 0:
            return d
    return min(cap, max(8, s // 8 * 8))


# ---------------------------------------------------------------------------
# sweep 1: gate statistics
# ---------------------------------------------------------------------------

def _stats_kernel(s_total: int, x_ref, w_ref, wp3_ref, mc_ref, pool_ref,
                  x3_ref):
    w = w_ref[...]                                    # [3, C]
    wp3 = wp3_ref[...]                                # [C, Cr+1] (last col
    #                                                    = 1/C: channel mean)
    t, st = x_ref.shape[1], x_ref.shape[2]
    si = pl.program_id(1)
    padded = s_total % st != 0                        # static

    @pl.when(si == 0)
    def _():
        pool_ref[...] = jnp.zeros_like(pool_ref)

    if padded:
        # rows past S in the final partial block must not feed the
        # accumulated pool (their mc/x3 stores fall off the array edge
        # and are dropped by the masked store)
        row = jax.lax.broadcasted_iota(jnp.int32, (st, 1), 0)
        valid = (si * st + row) < s_total             # [st, 1]

    shifted = []
    for tt in range(t):                               # static T: unrolled
        xs = x_ref[0, tt] * w[1]                      # [st, C]
        if tt > 0:
            xs += x_ref[0, tt - 1] * w[0]
        if tt + 1 < t:
            xs += x_ref[0, tt + 1] * w[2]
        pool_ref[0, tt] += jnp.sum(
            jnp.where(valid, xs, 0) if padded else xs,
            axis=0)                                   # accumulate over tiles
        shifted.append(xs)
    big = jnp.concatenate(shifted, axis=0)            # [T*st, C]
    # ONE MXU pass: the squeeze matmul and the channel mean (the 1/C
    # column) — a VPU cross-lane mean per t is far slower than an extra
    # matmul column
    x3m = jnp.dot(big, wp3, preferred_element_type=jnp.float32)
    x3m = x3m.reshape(t, st, -1)
    # static positive-bound slices: negative/ellipsis indexing lowers as a
    # gather, which Mosaic rejects beyond 2D
    cr1 = x3m.shape[-1]
    mc = jax.lax.slice_in_dim(x3m, cr1 - 1, cr1, axis=2)
    x3 = jax.lax.slice_in_dim(x3m, 0, cr1 - 1, axis=2)
    mc_ref[...] = mc[None].astype(mc_ref.dtype)
    x3_ref[...] = x3[None].astype(x3_ref.dtype)


def action_stats(x4: jnp.ndarray, w_shift: jnp.ndarray, w_p3: jnp.ndarray,
                 interpret: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """``x4 [N,T,S,C], w_shift [3,C], w_p3 [C,Cr]`` ->
    ``(mc [N,T,S,1], pooled_mean [N,T,C], x3_pre_bn [N,T,S,Cr])``."""
    n, t, s, c = x4.shape
    cr = w_p3.shape[-1]
    interpret = interpret or jax.default_backend() == "cpu"
    st = _s_tile(t, s, c, x4.dtype.itemsize, cr + 1)
    # append the channel-mean column so one matmul yields x3 AND mc
    wp3_aug = jnp.concatenate(
        [w_p3, jnp.full((c, 1), 1.0 / c, w_p3.dtype)], axis=1)

    def idx(ni, si):
        return (ni, 0, si, 0)

    mc, pool, x3 = pl.pallas_call(
        functools.partial(_stats_kernel, s),
        grid=(n, pl.cdiv(s, st)),
        in_specs=[
            pl.BlockSpec((1, t, st, c), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, c), lambda ni, si: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, cr + 1), lambda ni, si: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, t, st, 1), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, c), lambda ni, si: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, st, cr), idx, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, t, s, 1), x4.dtype),
            jax.ShapeDtypeStruct((n, t, c), x4.dtype),
            jax.ShapeDtypeStruct((n, t, s, cr), x4.dtype),
        ],
        interpret=interpret,
    )(x4, w_shift.astype(x4.dtype), wp3_aug.astype(x4.dtype))
    return mc, pool / s, x3


# ---------------------------------------------------------------------------
# sweep 2: gates + gated sum + wrapped 1x1 conv (MXU)
# ---------------------------------------------------------------------------

def _apply_kernel(x_ref, w_ref, g1_ref, gch_ref, wn_ref, out_ref):
    w = w_ref[...]                                    # [3, C]
    wn = wn_ref[...]                                  # [C, F]
    t = x_ref.shape[1]
    gated_all = []
    for tt in range(t):
        xs = x_ref[0, tt] * w[1]                      # [st, C]
        if tt > 0:
            xs += x_ref[0, tt - 1] * w[0]
        if tt + 1 < t:
            xs += x_ref[0, tt + 1] * w[2]
        # g1: per-pixel scalar gate [st, 1]; gch: per-channel gate [C]
        factor = (g1_ref[0, tt] + gch_ref[0, tt][None, :]).astype(xs.dtype)
        gated_all.append(xs * factor)
    big = jnp.concatenate(gated_all, axis=0)          # [T*st, C]
    y = jnp.dot(big, wn, preferred_element_type=jnp.float32)
    st = x_ref.shape[2]
    out_ref[...] = y.reshape(1, t, st, -1).astype(out_ref.dtype)


def action_apply(x4: jnp.ndarray, w_shift: jnp.ndarray, g1: jnp.ndarray,
                 gch: jnp.ndarray, w_net: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """``x4 [N,T,S,C], w_shift [3,C], g1 [N,T,S,1], gch [N,T,C],
    w_net [C,F]`` -> ``conv1x1(x_shift * (g1 + gch)) [N,T,S,F]``.

    ``gch`` must already include the residual offset: the ACTION gated sum is
    ``sum_i(x_shift*g_i + x_shift) = x_shift*(g1+g2+g3+3)`` (ref
    ``action.py:115``), so callers pass ``gch = g2 + g3 + 3``."""
    n, t, s, c = x4.shape
    f = w_net.shape[-1]
    interpret = interpret or jax.default_backend() == "cpu"
    st = _s_tile(t, s, c, x4.dtype.itemsize, f)

    def idx(ni, si):
        return (ni, 0, si, 0)

    return pl.pallas_call(
        _apply_kernel,
        grid=(n, pl.cdiv(s, st)),
        in_specs=[
            pl.BlockSpec((1, t, st, c), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, c), lambda ni, si: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, st, 1), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, c), lambda ni, si: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, f), lambda ni, si: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, st, f), idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t, s, f), x4.dtype),
        interpret=interpret,
    )(x4, w_shift.astype(x4.dtype), g1.astype(x4.dtype),
      gch.astype(x4.dtype), w_net.astype(x4.dtype))


# ---------------------------------------------------------------------------
# STE stencil (XLA middle): the reference's Conv3d(1, 1, 3) on a 1-channel
# map (action.py:39-41) has terrible lane utilization as a convolution; on
# the [N,T,H,W] mean map it is a 27-tap cross-correlation, which XLA fuses
# into one elementwise loop.
# ---------------------------------------------------------------------------

def ste_stencil(mc: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """``mc [N,T,H,W], kernel [3,3,3]`` -> SAME zero-padded cross-correlation
    (equals ``Conv3d(1,1,3,padding=1,bias=False)`` on ``mc[..., None]``)."""
    n, t, h, w = mc.shape
    xp = jnp.pad(mc, ((0, 0), (1, 1), (1, 1), (1, 1)))
    out = jnp.zeros_like(mc)
    for a in range(3):
        for b in range(3):
            for c in range(3):
                out = out + kernel[a, b, c] * xp[:, a:a + t, b:b + h,
                                                 c:c + w]
    return out
