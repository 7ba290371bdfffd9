"""Gradient-accumulation throughput on the chip: effective batches beyond
the single-pass HBM wall (b48 OOMs; docs/PERF.md batch sweep).

For each (accum, micro) pair, runs the full MTMM step with
``make_train_step(accum_steps=accum)`` at effective batch accum*micro and
reports clips/s next to the single-pass peak (b16 = 104) — the cost of
large-batch semantics (LR scaling laws, BN micro-stats) is the delta.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_accum.py \
      [--pairs 1x16,2x16,4x16,8x16,2x32]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import torch  # noqa: F401  (torch before jax; CLAUDE.md)
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/ehgr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ehgr_tpu.configs import LossConfig, OptimConfig
from ehgr_tpu.models.tsn import variant
from ehgr_tpu.train.optim import build_optimizer
from ehgr_tpu.train.steps import create_train_state, make_train_step

T, HW, CLS = 8, 224, 83
MEAN, STD = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)


def run(accum: int, micro: int, iters: int = 6):
    batch = accum * micro
    model = variant("tsn_mtmm", num_class=CLS, num_segments=T,
                    base_model="resnet50", temporal="action",
                    partial_bn=False, dtype=jnp.bfloat16)
    x0 = jnp.zeros((2, T, HW, HW, 3), jnp.float32)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        {"params": jax.random.key(0)}, x0)
    tx, _ = build_optimizer(variables["params"], OptimConfig(),
                            steps_per_epoch=100)
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, stage="mtmm",
                           loss_cfg=LossConfig(depth_size=HW // 4),
                           ema_decay=0.9999, mean=MEAN, std=STD,
                           accum_steps=accum)
    rng = np.random.default_rng(2)
    b = {"rgb": jnp.asarray(rng.integers(0, 256, (batch, T, HW, HW, 3)),
                            jnp.uint8),
         "depth": jnp.asarray(rng.integers(0, 256, (batch, T, HW, HW, 1)),
                              jnp.uint8),
         "label": jnp.asarray(rng.integers(0, CLS, (batch,)))}
    key = jax.random.key(0)
    try:
        for i in range(2):
            state, m = step(state, b, jax.random.fold_in(key, i))
        float(m["loss"])
        t0 = time.perf_counter()
        for i in range(iters):
            state, m = step(state, b, jax.random.fold_in(key, 2 + i))
        float(m["loss"])
        dt = (time.perf_counter() - t0) / iters
    except Exception as e:  # noqa: BLE001 — OOM rows are data
        print(f"{accum}x{micro} (eff {batch:3d})  FAILED: "
              f"{type(e).__name__} {str(e)[:80]}", flush=True)
        return {"accum": accum, "micro": micro, "clips_per_s": 0.0,
                "error": type(e).__name__}
    cps = batch / dt
    print(f"{accum}x{micro} (eff {batch:3d})  {dt * 1e3:7.1f} ms/step  "
          f"{cps:6.1f} clips/s", flush=True)
    return {"accum": accum, "micro": micro, "eff_batch": batch,
            "ms_per_step": round(dt * 1e3, 1), "clips_per_s": round(cps, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", default="1x16,2x16,4x16,8x16,2x32")
    args = ap.parse_args()
    rows = []
    for pair in args.pairs.split(","):
        a, m = pair.split("x")
        rows.append(run(int(a), int(m)))
    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
