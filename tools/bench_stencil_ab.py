"""A/B the ACTION STE/ME stencil forms vs conv lowerings at the inference
bench geometry (b384, T=8, 224²) — chasing the 470→428 clips/s drop between
the round-2 bench row and the round-3 re-run (the stencil rewrite, measured
neutral in the full TRAIN step, is the only forward-path code change).

  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_stencil_ab.py
"""

from __future__ import annotations

import json
import time

import numpy as np
import torch  # noqa: F401  (torch before jax; CLAUDE.md)
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/ehgr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ehgr_tpu.models.tsn import variant
from ehgr_tpu.ops import action
from ehgr_tpu.ops.preprocess_device import normalize_clip

BATCH, T, HW = 384, 8, 224


def bench(ste: bool, dw: bool, warmup=3, iters=10):
    action.STE_STENCIL = ste
    action.DW_STENCIL = dw
    model = variant("tsn", num_class=83, num_segments=T,
                    base_model="resnet50", temporal="action",
                    partial_bn=False, dtype=jnp.bfloat16)
    x0 = jnp.zeros((BATCH, T, HW, HW, 3), jnp.uint8)
    init_fn = jax.jit(lambda r, x: model.init(r, x, train=False))
    variables = jax.block_until_ready(init_fn(
        {"params": jax.random.key(0)}, normalize_clip(x0, dtype=jnp.bfloat16)))

    @jax.jit
    def score(frames_u8):
        x = normalize_clip(frames_u8, dtype=jnp.bfloat16)
        return model.apply(variables, x, train=False)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (BATCH, T, HW, HW, 3)),
                         jnp.uint8)
    for _ in range(warmup):
        float(jnp.sum(score(frames)))     # hard sync (tunnel; CLAUDE.md)
    t0 = time.perf_counter()
    outs = [score(frames) for _ in range(iters)]
    float(jnp.sum(outs[-1]))
    dt = time.perf_counter() - t0
    cps = BATCH * iters / dt
    print(f"STE_STENCIL={ste} DW_STENCIL={dw}: {cps:.1f} clips/s",
          flush=True)
    return round(cps, 1)


def main():
    rows = {
        "stencil_both": bench(True, True),
        "conv_both": bench(False, False),
        "ste_only": bench(True, False),
        "dw_only": bench(False, True),
    }
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
