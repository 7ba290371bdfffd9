"""Kernel/placement ablation bench on the real chip (docs/PERF.md data).

Usage:  python tools/bench_ablations.py [name ...]

Each named config builds the bench.py inference model (TSN + ACTION
ResNet-50, 8-frame 224^2, bf16) with one knob changed and reports pipelined
clips/s.  Results are recorded in docs/PERF.md; this script is the committed
provenance for those numbers.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    "xla": dict(temporal="action", action_fused=None),
    # int8 MXU backbone convs (ops/quantize.py); int8 = dynamic scales,
    # int8s = static calibrated scales (calibrated on the bench input)
    "int8": dict(temporal="action", action_fused=None, quantize=True),
    "int8_plain": dict(temporal="none", action_fused=None, quantize=True),
    "int8_l4": dict(temporal="action", action_stages=(4,), quantize=True),
    "int8s": dict(temporal="action", action_fused=None, quantize="static"),
    "int8s_plain": dict(temporal="none", quantize="static"),
    "int8s_l4": dict(temporal="action", action_stages=(4,),
                     quantize="static"),
    "prologue": dict(temporal="action", action_fused="prologue"),
    "mega": dict(temporal="action", action_fused="mega"),
    "plain": dict(temporal="none", action_fused=None),
    "tsm": dict(temporal="tsm", action_fused=None),
    # placement ablations (the ACTION paper's accuracy/compute knob)
    "xla_l34": dict(temporal="action", action_stages=(3, 4)),
    "mega_l34": dict(temporal="action", action_fused="mega",
                     action_stages=(3, 4)),
    "xla_l4": dict(temporal="action", action_stages=(4,)),
    "xla_l12": dict(temporal="action", action_stages=(1, 2)),
    "mega_l12": dict(temporal="action", action_fused="mega",
                     action_stages=(1, 2)),
}

BATCH, T, HW = 384, 8, 224


def bench_one(name: str, batch: int = BATCH, warmup: int = 3,
              iters: int = 10) -> float:
    import jax
    import jax.numpy as jnp

    from ehgr_tpu.models.tsn import variant
    from ehgr_tpu.ops.preprocess_device import normalize_clip

    cfg = CONFIGS[name]
    model = variant("tsn", num_class=83, num_segments=T,
                    base_model="resnet50", partial_bn=False,
                    dtype=jnp.bfloat16, **cfg)
    x0 = jnp.zeros((batch, T, HW, HW, 3), jnp.uint8)
    init_fn = jax.jit(lambda r, x: model.init(r, x, train=False))
    variables = jax.block_until_ready(init_fn(
        {"params": jax.random.key(0)},
        normalize_clip(x0, dtype=jnp.bfloat16)))
    if cfg.get("quantize") == "static":
        # one-batch activation-scale calibration (ops/quantize.calibrate)
        from ehgr_tpu.ops.quantize import calibrate
        calib = variant("tsn", num_class=83, num_segments=T,
                        base_model="resnet50", partial_bn=False,
                        dtype=jnp.bfloat16,
                        **{**cfg, "quantize": "calib"})
        cal_rng = np.random.default_rng(7)
        xb = normalize_clip(jnp.asarray(
            cal_rng.integers(0, 256, (32, T, HW, HW, 3)), jnp.uint8),
            dtype=jnp.bfloat16)
        variables = jax.block_until_ready(
            calibrate(calib, variables, [xb]))

    @jax.jit
    def score(frames_u8):
        x = normalize_clip(frames_u8, dtype=jnp.bfloat16)
        return model.apply(variables, x, train=False)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, (batch, T, HW, HW, 3)), jnp.uint8)
    for _ in range(warmup):
        score(frames).block_until_ready()
    t0 = time.perf_counter()
    outs = [score(frames) for _ in range(iters)]
    outs[-1].block_until_ready()
    dt = time.perf_counter() - t0
    cps = batch * iters / dt
    print(f"{name:10s} {cps:8.1f} clips/s   ({dt / iters * 1e3:.1f} ms/call "
          f"@ batch {batch})", flush=True)
    return cps


def main():
    names = sys.argv[1:] or ["xla", "mega"]
    for name in names:
        bench_one(name)


if __name__ == "__main__":
    main()
