"""Fused ACTION prologue kernel (inference fast path).

Profiling (README "Performance"): the ACTION temporal module costs ~2.5x the
plain backbone at inference, dominated by repeated HBM passes over the
shifted activation — the XLA graph reads ``x_shift`` separately for the STE
channel-mean, the CE spatial pool, the ME squeeze conv, and the gated sum.

This kernel performs ONE pass over ``x``:
  x_shift   = 3-tap learnable temporal shift        (action.py:25-36)
  mean_c    = mean over channels (STE input)        (action.py:77-79)
  pool_hw   = sum over H,W (CE input; /HW outside)  (action.py:86)
  x3        = x_shift @ W_p3 (ME squeeze pre-BN)    (action.py:99)

emitting all four in a single grid sweep: HBM traffic drops from ~5 reads +
1 write of the full activation to 1 read + 1 write (+ C/16-sized extras).
The gates themselves (tiny convs / dense layers) and the gated-sum + wrapped
1x1 conv stay in XLA, which fuses them into the following matmul.

Forward-only: ``ActionConv`` uses it when ``train=False``; training takes the
XLA formulation (autodiff).  Parity enforced by tests/test_action_fused.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ehgr_tpu.ops.pallas.shift import _slab_rows


def _kernel(x_ref, w_ref, wp3_ref, xs_ref, mc_ref, pool_ref, x3_ref):
    w = w_ref[...]                                   # [3, C]
    wp3 = wp3_ref[...]                               # [C, Cr]
    t = x_ref.shape[1]
    hi = pl.program_id(1)

    @pl.when(hi == 0)
    def _():
        pool_ref[...] = jnp.zeros_like(pool_ref)

    for tt in range(t):
        xs = x_ref[0, tt] * w[1]
        if tt > 0:
            xs += x_ref[0, tt - 1] * w[0]
        if tt + 1 < t:
            xs += x_ref[0, tt + 1] * w[2]
        xs_ref[0, tt] = xs                            # [ht, W, C]
        mc_ref[0, tt] = jnp.mean(xs, axis=-1, keepdims=True)
        pool_ref[0, tt] += jnp.sum(xs, axis=(0, 1))   # accumulate over tiles
        ht, wd, c = xs.shape
        x3 = jnp.dot(xs.reshape(ht * wd, c), wp3,
                     preferred_element_type=jnp.float32)
        x3_ref[0, tt] = x3.reshape(ht, wd, -1).astype(x3_ref.dtype)


def action_fused_prologue(x5: jnp.ndarray, w_shift: jnp.ndarray,
                          w_p3: jnp.ndarray, interpret: bool = False
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                     jnp.ndarray]:
    """``x5 [N,T,H,W,C], w_shift [3,C], w_p3 [C,Cr]`` ->
    ``(x_shift [N,T,H,W,C], mean_c [N,T,H,W,1], pooled_mean [N,T,C],
    x3_pre_bn [N,T,H,W,Cr])``."""
    n, t, h, wd, c = x5.shape
    cr = w_p3.shape[-1]
    ht = _slab_rows(t, h, wd, c, x5.dtype.itemsize, budget=1 << 20)
    blk = lambda cc: (1, t, ht, wd, cc)

    def idx(ni, hi):
        return (ni, 0, hi, 0, 0)

    xs, mc, pool, x3 = pl.pallas_call(
        _kernel,
        grid=(n, h // ht),
        in_specs=[
            pl.BlockSpec(blk(c), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, c), lambda ni, hi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, cr), lambda ni, hi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(blk(c), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk(1), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, c), lambda ni, hi: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk(cr), idx, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, t, h, wd, c), x5.dtype),
            jax.ShapeDtypeStruct((n, t, h, wd, 1), x5.dtype),
            jax.ShapeDtypeStruct((n, t, c), x5.dtype),
            jax.ShapeDtypeStruct((n, t, h, wd, cr), x5.dtype),
        ],
        interpret=interpret,
    )(x5, w_shift.astype(x5.dtype), w_p3.astype(x5.dtype))
    return xs, mc, pool / (h * wd), x3
