"""Int8 quantized inference for the backbone convs (TPU MXU int8 path).

Motivation (docs/PERF.md round-2 int8 experiment): on v5e the MXU runs
int8 at up to 2x the bf16 rate — measured 1.4-2.2x per conv at ResNet-50
shapes (`tools/bench_int8.py`).  This module makes that a model flag:

* ``QuantConv`` is a drop-in for ``nn.Conv(use_bias=False)`` with the
  IDENTICAL param tree (``('kernel',)``, same shape/init), so existing
  checkpoints and ``models/torch_import.py`` load unchanged.
* Weights: per-output-channel symmetric int8.  The kernel is a jit-time
  constant, so XLA folds the quantization — zero runtime cost.
* Activations: dynamic per-tensor symmetric int8 (one amax reduction per
  conv; convs at these shapes are compute-bound, so the extra read is
  cheap next to the MXU-rate doubling).
* ``quantized=False`` (and training) takes the exact float path — the
  flag only changes inference numerics, never the tree.

Accuracy note: dynamic per-tensor activation quant is the conservative,
calibration-free choice; real-data validation is still required before
deploying (BASELINE.md top-1 parity).  First/last layers (stem conv, fc
head, ACTION gate math) intentionally stay in bf16/f32 — standard int8
practice, and the gates' sigmoid precision is parity-sensitive.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``[kh,kw,cin,cout] -> (int8 kernel, f32 per-cout scale)``."""
    ws = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2)) / 127.0
    ws = jnp.maximum(ws, 1e-12)
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / ws), -127,
                  127).astype(jnp.int8)
    return wq, ws


def quantize_activation(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic per-tensor symmetric int8: ``x -> (int8 x, f32 scale)``."""
    xs = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
    xs = jnp.maximum(xs, 1e-12)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -127,
                  127).astype(jnp.int8)
    return xq, xs


class QuantConv(nn.Module):
    """``nn.Conv(use_bias=False)`` twin with an int8 MXU inference path.

    Same ``params`` tree (``kernel``, lecun-normal init) in every mode,
    plus an ``act_scale`` entry in the separate ``quant`` collection for
    the static path.  The ``mode`` call arg picks the compute path:

    * ``'float'``   — exact ``nn.Conv`` math (training / parity).
    * ``'dynamic'`` — per-tensor amax quant each call.  Calibration-free
      but MEASURED SLOWER in-model (docs/PERF.md): the serial
      amax -> quantize -> conv chain costs more than the int8 MXU saves.
    * ``'static'``  — use the calibrated ``act_scale``; the quantize is a
      pointwise op XLA fuses into the producer, so the conv's 2x MXU
      rate is pure win.
    * ``'calib'``   — float conv + running-max update of ``act_scale``
      (apply with ``mutable=['quant']``; see ``calibrate``).
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME"
    use_bias: bool = False          # signature parity; bias unsupported
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "dynamic",
                 declare_scale: bool = False) -> jnp.ndarray:
        assert not self.use_bias, "QuantConv replicates use_bias=False convs"
        kh, kw = self.kernel_size
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features))
        # per-tensor activation scale for the static path (quant collection:
        # extra to — never part of — the checkpointed params tree; only
        # declared in the modes that use it so float/dynamic trees stay
        # byte-identical to nn.Conv's)
        # ``declare_scale`` lets a float-mode call (training pass of a
        # static/calib model) still declare the variable, so a tree
        # initialized via a train=True trace carries the quant collection a
        # later static apply needs (ADVICE r2 #4)
        act_scale = self.variable(
            "quant", "act_scale", lambda: jnp.zeros((), jnp.float32)) \
            if (mode in ("static", "calib") or declare_scale) else None
        padding = self.padding if isinstance(self.padding, str) \
            else [tuple(p) for p in self.padding]

        def float_conv():
            y = jax.lax.conv_general_dilated(
                x, w.astype(self.dtype), tuple(self.strides), padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y.astype(self.dtype)

        if mode == "float":
            return float_conv()
        if mode == "calib":
            if not self.is_initializing() and \
                    self.is_mutable_collection("quant"):
                amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
                act_scale.value = jnp.maximum(act_scale.value, amax / 127.0)
            return float_conv()

        wq, ws = quantize_weight(w)             # folded at compile
        if mode == "static":
            xs = jnp.maximum(act_scale.value, 1e-12)
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -127,
                          127).astype(jnp.int8)
        else:                                    # dynamic
            xq, xs = quantize_activation(x)
        y = jax.lax.conv_general_dilated(
            xq, wq, tuple(self.strides), padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * (xs * ws)).astype(self.dtype)


def calibrate(model, variables, batches, **apply_kw):
    """Run calibration batches through a ``quantize='calib'`` model and
    return ``variables`` with the per-site ``act_scale`` running maxima
    filled in (use them with a ``quantize='static'`` twin — same tree)."""
    for b in batches:
        _, upd = model.apply(variables, b, train=False, mutable=["quant"],
                             **apply_kw)
        variables = {**variables, "quant": upd["quant"]}
    return variables
