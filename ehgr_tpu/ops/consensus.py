"""TSN segment consensus (ref ``models/basic_ops.py:4-37``).

The reference implements mean-over-segments as an autograd Function; in JAX
it is just a reduction — differentiation is automatic and XLA fuses it into
the surrounding graph."""

from __future__ import annotations

import jax.numpy as jnp


def consensus(x: jnp.ndarray, consensus_type: str = "avg",
              axis: int = 1) -> jnp.ndarray:
    """``[N, T, ...] -> [N, ...]`` (avg) or identity.

    Matches ``SegmentConsensus``: 'avg' means mean over the segment axis;
    'identity' returns the input unchanged."""
    if consensus_type == "avg":
        return jnp.mean(x, axis=axis)
    if consensus_type == "identity":
        return x
    raise ValueError(f"unknown consensus type: {consensus_type}")
