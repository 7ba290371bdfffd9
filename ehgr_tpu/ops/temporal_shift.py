"""Temporal shift (TSM) and temporal pooling on ``[N, T, H, W, C]`` tensors.

Reference: ``/root/reference/models/temporal_shift.py`` — channel-partitioned
shift along T (1/n_div left, 1/n_div right, rest identity).  The reference's
in-place CUDA-kernel TODO (``temporal_shift.py:34-37``) is moot on TPU: the
shift is a pair of T-axis slice/concats that XLA lowers to cheap HBM-local
copies and fuses with the adjacent conv.  A Pallas kernel variant exists in
``ehgr_tpu.ops.pallas.shift`` for explicit VMEM-resident fusion; both are
verified equal by ``tests/test_shift.py`` (the analogue of the reference's
only assert-based test, ``temporal_shift.py:158-207``).
"""

from __future__ import annotations

import jax.numpy as jnp


def temporal_shift(x: jnp.ndarray, fold_div: int = 8) -> jnp.ndarray:
    """TSM shift: first ``C/fold_div`` channels shift left (t reads t+1),
    next ``C/fold_div`` shift right (t reads t-1), rest untouched; zero
    padding at clip edges.  ``x``: ``[N, T, H, W, C]``."""
    c = x.shape[-1]
    fold = c // fold_div
    left = jnp.concatenate(
        [x[:, 1:, ..., :fold], jnp.zeros_like(x[:, :1, ..., :fold])], axis=1)
    right = jnp.concatenate(
        [jnp.zeros_like(x[:, :1, ..., fold:2 * fold]),
         x[:, :-1, ..., fold:2 * fold]], axis=1)
    return jnp.concatenate([left, right, x[..., 2 * fold:]], axis=-1)


def temporal_pool(x: jnp.ndarray) -> jnp.ndarray:
    """Max-pool T by 2 with kernel 3, padding 1 (ref ``temporal_shift.py:79-98``).
    ``[N, T, H, W, C] -> [N, T//2, H, W, C]``."""
    n, t = x.shape[0], x.shape[1]
    pad = jnp.full_like(x[:, :1], -jnp.inf)
    xp = jnp.concatenate([pad, x, pad], axis=1)       # [N, T+2, ...]
    starts = jnp.arange(0, t, 2)                      # kernel 3, stride 2
    windows = jnp.stack([xp[:, s:s + 3] for s in starts], axis=1)
    return jnp.max(windows, axis=2)


def learnable_shift(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Learnable temporal shift: depthwise length-3 conv over T per channel
    (the ACTION module's ``action_shift``, ref ``models/action.py:25-36``).

    ``x``: ``[N, T, ..., C]``; ``w``: ``[3, C]`` cross-correlation taps, so
    ``out[t] = w[0]*x[t-1] + w[1]*x[t] + w[2]*x[t+1]`` with zero padding —
    identical to ``nn.Conv1d(C, C, 3, padding=1, groups=C)``.  Initialized to
    the TSM pattern this *is* the shift, but trainable.  Implemented as three
    fused multiply-adds on the VPU (no matmul needed for a depthwise k=3)."""
    zeros = jnp.zeros_like(x[:, :1])
    x_prev = jnp.concatenate([zeros, x[:, :-1]], axis=1)
    x_next = jnp.concatenate([x[:, 1:], zeros], axis=1)
    return x_prev * w[0] + x * w[1] + x_next * w[2]


def tsm_shift_init(c: int, fold_div: int = 8, dtype=jnp.float32) -> jnp.ndarray:
    """``[3, C]`` taps matching the reference init (``action.py:30-36``):
    first C/fold_div channels take tap w[2]=1 (shift left), next C/fold_div
    take w[0]=1 (shift right), the rest w[1]=1 (identity)."""
    fold = c // fold_div
    w = jnp.zeros((3, c), dtype=dtype)
    w = w.at[2, :fold].set(1.0)
    w = w.at[0, fold:2 * fold].set(1.0)
    if 2 * fold < c:
        w = w.at[1, 2 * fold:].set(1.0)
    return w
