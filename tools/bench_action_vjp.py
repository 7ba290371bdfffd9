"""A/B the custom-VJP ACTION backward vs autodiff on the real chip.

VERDICT r3 next #3: round 3 pinned the training gap to the gate backward
(75 ms/step at b32; sg-all ceiling 116 clips/s) and prescribed a fused
VJP that recomputes the gates and folds all four ``d(x_shift)``
contributions into one sweep.  ``ops/action_vjp.py`` implements it;
this tool measures whether it moves the full MTMM train step
(``ActionConv(fused='vjp')`` vs the default autodiff path), at the
round-2 megakernel write-up's quality bar either way.

Results are written to a VERSION-CONTROLLED path by default
(VERDICT r3 next #7): runs/round4_action_vjp.json.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_action_vjp.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def _batch(batch):
    rng = np.random.default_rng(2)
    return {
        "rgb": jnp.asarray(rng.integers(0, 256, (batch, T, HW, HW, 3)),
                           jnp.uint8),
        "label": jnp.asarray(rng.integers(0, CLS, (batch,))),
        "depth": jnp.asarray(rng.integers(0, 256, (batch, T, HW, HW, 1)),
                             jnp.uint8),
    }


def _time_step(step, state, b, key, warmup=2, iters=8):
    """Pipelined dispatch, scalar barrier via float(metrics['loss'])."""
    st = state
    for _ in range(warmup):
        st, m = step(st, b, key)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        st, m = step(st, b, key)
    float(m["loss"])
    return (time.perf_counter() - t0) / iters * 1e3


def run_row(fused, batch, iters):
    model = variant("tsn_mtmm", num_class=CLS, num_segments=T,
                    base_model="resnet50", temporal="action",
                    partial_bn=False, action_fused=fused,
                    dtype=jnp.bfloat16)
    x0 = jnp.zeros((2, T, HW, HW, 3), jnp.float32)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        {"params": jax.random.key(0)}, x0)
    tx, _ = build_optimizer(variables["params"], OptimConfig(),
                            steps_per_epoch=100)
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, stage="mtmm",
                           loss_cfg=LossConfig(depth_size=HW // 4),
                           ema_decay=0.9999, mean=MEAN, std=STD,
                           donate=False)
    ms = _time_step(step, state, _batch(batch), jax.random.key(0),
                    iters=iters)
    cps = batch / (ms / 1e3)
    label = fused or "xla"
    print(f"mtmm action b{batch:<3d} bwd={label:4s}  step={ms:7.1f} ms  "
          f"{cps:6.1f} clips/s", flush=True)
    return {"fused": label, "batch": batch, "step_ms": round(ms, 2),
            "clips_per_sec": round(cps, 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/round4_action_vjp.json")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--batches", type=int, nargs="+", default=[16, 32])
    args = ap.parse_args()

    rows = []
    for batch in args.batches:
        for fused in (None, "vjp"):
            rows.append(run_row(fused, batch, args.iters))

    rec = {"tool": "bench_action_vjp", "ts": time.strftime("%F %T"),
           "device": str(jax.devices()[0]), "rows": rows}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
