"""Full-train-step sweep: batch size x remat variant (round-3 MFU attack).

Attribution (tools/bench_train_attrib.py, docs/PERF.md round 3) showed the
MTMM step is backward-bound (bwd = 2.8x fwd; opt+EMA = 8 ms) and that b16
outruns b32 in clips/s — HBM pressure, not occupancy.  The candidate fix is
rematerializing the learnable shift at every ACTION site: x_shift is a 3-tap
temporal FMA of x, so recomputing it in the backward frees one [NT,H,W,C]
buffer per site (~400 MB at layer1 scale, 16 sites) for ~zero extra FLOPs.

Variants:
  base         — the shipped step
  shift-remat  — jax.checkpoint around learnable_shift (monkeypatched)
  stage-remat  — ModelConfig.remat=True (whole-bottleneck remat, round-2 knob)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_train_sweep.py \
    [--batches 16,24,32,48] [--variants base,shift-remat]
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import torch  # noqa: F401  (torch before jax; CLAUDE.md)
import jax
import jax.numpy as jnp

# persistent jit cache: repeat tool invocations skip the ~5 min remote
# compiles (tunnel compile service)
jax.config.update("jax_compilation_cache_dir", "/tmp/ehgr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


from ehgr_tpu.configs import LossConfig, OptimConfig
from ehgr_tpu.models.tsn import variant
from ehgr_tpu.train.optim import build_optimizer
from ehgr_tpu.train.steps import create_train_state, make_train_step

import ehgr_tpu.ops.action as action_mod
import ehgr_tpu.ops.temporal_shift as ts_mod
import ehgr_tpu.models.resnet as resnet_mod

T, HW, CLS = 8, 224, 83
MEAN, STD = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)

_ORIG_SHIFT = ts_mod.learnable_shift


def set_variant(name: str) -> bool:
    """Returns the stage-remat flag; patches/restores the shift/STE forms."""
    shift = _ORIG_SHIFT
    if name == "shift-remat":
        shift = jax.checkpoint(_ORIG_SHIFT)
    action_mod.learnable_shift = shift
    ts_mod.learnable_shift = shift
    # 'ste-conv' measures the old lax.conv lane-padded STE form; everything
    # else uses the shipped default (shifted-FMA stencil)
    action_mod.STE_STENCIL = name != "ste-conv"
    # 'dw-conv' measures the old grouped-conv ME form
    action_mod.DW_STENCIL = name != "dw-conv"
    # 'sg-<gate>' stop-gradients that gate: forward unchanged, that branch's
    # backward disappears — per-branch backward attribution
    action_mod.SG_GATES = (frozenset(("ste", "ce", "me"))
                           if name == "sg-all" else
                           frozenset((name[3:],)) if name.startswith("sg-")
                           else frozenset())
    # 'action-remat': rematerialize the whole ACTION module in the backward
    # (gates + x_shift recomputed; their temps never stored).  Wrapper makes
    # `train` positional for jax.checkpoint's static_argnums (flax remat
    # can't mark kwargs static); param paths shift — fine for an A/B bench.
    from flax import linen as nn

    class _RematAction(nn.Module):
        features: int
        n_segment: int
        shift_div: int = 8
        bn_frozen: bool = True
        dtype: object = jnp.float32
        fused: object = None
        quantize: object = False

        @nn.compact
        def __call__(self, x, train=False):
            inner = nn.remat(action_mod.ActionConv, static_argnums=(2,))(
                self.features, n_segment=self.n_segment,
                shift_div=self.shift_div, bn_frozen=self.bn_frozen,
                dtype=self.dtype, fused=self.fused, name="a")
            return inner(x, train)

    resnet_mod.ActionConv = (_RematAction if name == "action-remat"
                             else action_mod.ActionConv)
    return name == "stage-remat"


def run(batch: int, vname: str, iters: int = 6) -> float:
    remat = set_variant(vname)
    model = variant("tsn_mtmm", num_class=CLS, num_segments=T,
                    base_model="resnet50", temporal="action",
                    partial_bn=False, remat=remat, dtype=jnp.bfloat16)
    x0 = jnp.zeros((2, T, HW, HW, 3), jnp.float32)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        {"params": jax.random.key(0)}, x0)
    tx, _ = build_optimizer(variables["params"], OptimConfig(),
                            steps_per_epoch=100)
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, stage="mtmm",
                           loss_cfg=LossConfig(depth_size=HW // 4),
                           ema_decay=0.9999, mean=MEAN, std=STD)
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
    except Exception as e:  # noqa: BLE001 — OOM rows are data, not failures
        print(f"{vname:12s} b={batch:3d}  FAILED: {type(e).__name__} "
              f"{str(e)[:80]}", flush=True)
        return 0.0
    cps = batch / dt
    print(f"{vname:12s} b={batch:3d}  {dt * 1e3:7.1f} ms/step  "
          f"{cps:6.1f} clips/s", flush=True)
    return cps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="16,24,32,48")
    ap.add_argument("--variants", default="base,shift-remat,stage-remat")
    args = ap.parse_args()
    for v in args.variants.split(","):
        for bs in args.batches.split(","):
            run(int(bs), v)


if __name__ == "__main__":
    main()
