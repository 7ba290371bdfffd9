"""Pallas TPU kernel for the TSM temporal shift.

The reference abandoned its in-place CUDA shift ("out of order error when
performing parallel computing", ``/root/reference/models/temporal_shift.py:
34-37``).  On TPU the shift is a VMEM-resident copy with channel-partitioned
neighbor reads — no ordering hazard: each (n, t) grid step reads the t-1/t/t+1
blocks and writes one output block, and the backward pass is the mirrored
shift (the op is linear), wired via ``jax.custom_vjp``.

XLA's slice/concat lowering of ``ehgr_tpu.ops.temporal_shift.temporal_shift``
is already fused into adjacent convs; this kernel exists for (a) parity with
the reference's intended fused op, (b) a building block for deeper fusions
(shift+conv1) if profiling ever justifies hand-scheduling.  Parity with the
reference semantics is enforced by ``tests/test_pallas_shift.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_kernel(fold: int, reverse: bool, x_prev, x_cur, x_next, out):
    """One (n, t) block: channels [0:fold) read t+1 (left shift), [fold:2fold)
    read t-1 (right shift), rest pass through.  ``reverse`` swaps the
    directions — the transpose/VJP of the shift."""
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    src_left = x_prev if reverse else x_next      # feeds channels [0:fold)
    src_right = x_next if reverse else x_prev     # feeds [fold:2fold)
    left_valid = (t >= 1) if reverse else (t + 1 < n_t)
    right_valid = (t + 1 < n_t) if reverse else (t >= 1)

    left = jnp.where(left_valid, src_left[..., :fold],
                     jnp.zeros_like(src_left[..., :fold]))
    right = jnp.where(right_valid, src_right[..., fold:2 * fold],
                      jnp.zeros_like(src_right[..., fold:2 * fold]))
    out[...] = jnp.concatenate(
        [left, right, x_cur[..., 2 * fold:]], axis=-1)


def _row_tile(h: int, w: int, c: int, itemsize: int,
              budget: int = 1 << 20) -> int:
    """Largest divisor of ``h`` keeping a (1,1,ht,w,c) block under ~1 MB —
    8 buffers (3 in + 1 out, double-buffered) stay well inside 16 MB VMEM."""
    ht = h
    while ht > 1 and ht * w * c * itemsize > budget:
        for d in range(ht - 1, 0, -1):
            if h % d == 0:
                ht = d
                break
    return ht


def _run_shift(x: jnp.ndarray, fold_div: int, reverse: bool,
               interpret: bool) -> jnp.ndarray:
    n, t, h, w, c = x.shape
    fold = c // fold_div
    ht = _row_tile(h, w, c, x.dtype.itemsize)
    blk = (1, 1, ht, w, c)

    def idx(dt):
        def index_map(ni, ti, hi):
            return (ni, jnp.clip(ti + dt, 0, t - 1), hi, 0, 0)
        return index_map

    spec = lambda dt: pl.BlockSpec(blk, idx(dt), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_shift_kernel, fold, reverse),
        grid=(n, t, h // ht),
        in_specs=[spec(-1), spec(0), spec(+1)],
        out_specs=pl.BlockSpec(blk, idx(0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, x, x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def tsm_shift_pallas(x: jnp.ndarray, fold_div: int = 8,
                     interpret: bool = False) -> jnp.ndarray:
    """TSM shift on ``[N, T, H, W, C]`` as a Pallas kernel (zero-pad edges,
    same semantics as ``temporal_shift.temporal_shift``)."""
    return _run_shift(x, fold_div, reverse=False, interpret=interpret)


def _fwd(x, fold_div, interpret):
    return tsm_shift_pallas(x, fold_div, interpret), None


def _bwd(fold_div, interpret, _, g):
    # linear op: VJP = reverse shift of the cotangent
    return (_run_shift(g, fold_div, reverse=True, interpret=interpret),)


tsm_shift_pallas.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Learnable (ACTION) shift: out[t] = w0*x[t-1] + w1*x[t] + w2*x[t+1]
# ---------------------------------------------------------------------------
# XLA's formulation (ehgr_tpu.ops.temporal_shift.learnable_shift) materializes
# the t-1 / t+1 copies -> ~3 HBM reads + concats per ACTION site; profiling
# shows the shift alone is ~48% of the ACTION-ResNet50 forward.  This kernel
# keeps the WHOLE T axis of an (n, h-tile) slab in VMEM, so each element is
# read from HBM exactly once and the three taps are VMEM-local FMAs.


def _lshift_kernel(x_ref, w_ref, out_ref):
    # unrolled over the (static, small) T axis: per-t temporaries only, so
    # VMEM holds just the in/out slabs — no materialized t+-1 copies
    w = w_ref[...]                                  # [3, C]
    t = x_ref.shape[1]
    for tt in range(t):
        acc = x_ref[0, tt] * w[1]
        if tt > 0:
            acc += x_ref[0, tt - 1] * w[0]
        if tt + 1 < t:
            acc += x_ref[0, tt + 1] * w[2]
        out_ref[0, tt] = acc


def _slab_rows(t: int, h: int, w: int, c: int, itemsize: int,
               budget: int = 2 << 20) -> int:
    ht = h
    while ht > 1 and t * ht * w * c * itemsize > budget:
        for d in range(ht - 1, 0, -1):
            if h % d == 0:
                ht = d
                break
    return ht


def _run_lshift(x: jnp.ndarray, w: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    n, t, h, wd, c = x.shape
    ht = _slab_rows(t, h, wd, c, x.dtype.itemsize)
    blk = (1, t, ht, wd, c)
    return pl.pallas_call(
        _lshift_kernel,
        grid=(n, h // ht),
        in_specs=[
            pl.BlockSpec(blk, lambda ni, hi: (ni, 0, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, c), lambda ni, hi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(blk, lambda ni, hi: (ni, 0, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, w.astype(x.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def learnable_shift_pallas(x: jnp.ndarray, w: jnp.ndarray,
                           interpret: bool = False) -> jnp.ndarray:
    """Depthwise 3-tap temporal conv (the ACTION ``action_shift``,
    ``models/action.py:25-36``) as a single-HBM-pass Pallas kernel.
    ``x``: [N,T,H,W,C]; ``w``: [3,C] cross-correlation taps."""
    return _run_lshift(x, w, interpret)


def _l_fwd(x, w, interpret):
    return _run_lshift(x, w, interpret), (x, w)


def _l_bwd(interpret, res, g):
    x, w = res
    # dL/dx[s] = w0*g[s+1] + w1*g[s] + w2*g[s-1]  == shift with flipped taps
    dx = _run_lshift(g, w[::-1], interpret)
    # dL/dw[k,c] = sum_{n,t,hw} x[t+k-1] * g[t]
    gz = g.astype(jnp.float32)
    xz = x.astype(jnp.float32)
    dw0 = jnp.sum(xz[:, :-1] * gz[:, 1:], axis=(0, 1, 2, 3))
    dw1 = jnp.sum(xz * gz, axis=(0, 1, 2, 3))
    dw2 = jnp.sum(xz[:, 1:] * gz[:, :-1], axis=(0, 1, 2, 3))
    dw = jnp.stack([dw0, dw1, dw2]).astype(w.dtype)
    return dx, dw


learnable_shift_pallas.defvjp(_l_fwd, _l_bwd)
