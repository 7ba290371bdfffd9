"""Benchmark: inference clips/sec/chip on the flagship deployment model.

Protocol matches BASELINE.json's metric surface: 8-frame 224^2 RGB clips
through TSN + ACTION ResNet-50 (the EgoGesture MTMM deploy config — decoder
dropped at inference), uint8 in, on-device normalize, bf16 compute.

vs_baseline: the only primary-source throughput number for the reference is
~15 clips/s on its (unrecorded) training GPU (BASELINE.md: batch 8 /
0.52 s steady step); the north star is >=5x that per chip.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ehgr_tpu.models.tsn import variant
    from ehgr_tpu.ops.preprocess_device import normalize_clip

    BATCH = 384         # clips per call (sweep: 256->451, 384->469, 512 OOM)
    T, HW = 8, 224
    WARMUP, ITERS = 3, 10

    model = variant("tsn", num_class=83, num_segments=T,
                    base_model="resnet50", temporal="action",
                    partial_bn=False, dtype=jnp.bfloat16)
    x0 = jnp.zeros((BATCH, T, HW, HW, 3), jnp.uint8)
    init_fn = jax.jit(lambda r, x: model.init(r, x, train=False))
    variables = jax.block_until_ready(init_fn(
        {"params": jax.random.key(0)},
        normalize_clip(x0, dtype=jnp.bfloat16)))

    @jax.jit
    def score(frames_u8):
        x = normalize_clip(frames_u8, dtype=jnp.bfloat16)
        return model.apply(variables, x, train=False)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, (BATCH, T, HW, HW, 3)), jnp.uint8)

    for _ in range(WARMUP):
        score(frames).block_until_ready()

    # throughput: pipelined dispatch (async jax dispatch overlaps host/device)
    t0 = time.perf_counter()
    outs = [score(frames) for _ in range(ITERS)]
    outs[-1].block_until_ready()
    dt = time.perf_counter() - t0

    clips_per_sec = BATCH * ITERS / dt
    baseline = 15.0  # reference ~15 clips/s (BASELINE.md train-step rate)
    print(json.dumps({
        "metric": "clips/sec/chip, 8-frame 224^2 inference, "
                  "TSN+ACTION ResNet-50 bf16",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / baseline, 2),
    }))


if __name__ == "__main__":
    main()
