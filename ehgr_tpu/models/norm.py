"""Drop-in BatchNorm with torch's running-stat semantics.

``flax.linen.BatchNorm`` updates the running variance with the BIASED batch
variance; ``torch.nn.BatchNorm2d`` uses the UNBIASED one (``var * n/(n-1)``)
for the running update while normalizing with the biased one.  The reference
trains entirely with torch BN (every backbone/decoder), so faithful
training-trajectory parity — and checkpoint interchange of *trained* models —
needs the torch rule.  Everything else (param/variable names ``scale``,
``bias``, ``batch_stats/{mean,var}``, f32 stats, biased-variance
normalization) matches flax so converters and shardings are unaffected.

Ref: torch BatchNorm update (momentum 0.1) == this module at momentum=0.9
(flax convention: ``new = momentum*old + (1-momentum)*batch``).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class BatchNorm(nn.Module):
    use_running_average: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # statistics in f32 (flax/torch both do), normalize below in the
            # compute dtype — an all-f32 normalize chain in a bf16 model
            # doubles HBM traffic through every BN fwd+bwd (measured 3x
            # train-step slowdown, round 3)
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            mean2 = jnp.mean(jnp.square(xf), axis=axes)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = math.prod(x.shape[:-1])
                corr = n / max(n - 1, 1)          # torch's unbiased factor
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * (var * corr)

        # fold to one per-channel FMA: a = scale/sqrt(var+eps) (f32),
        # b = bias - mean*a; the elementwise apply runs in the compute dtype
        a = scale * jax.lax.rsqrt(var + self.epsilon)
        b = bias - mean * a
        dt = self.dtype or x.dtype
        return (x.astype(dt) * a.astype(dt) + b.astype(dt)).astype(dt)
