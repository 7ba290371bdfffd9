"""Stage-level cost attribution for the ACTION ResNet-50 (real chip).

Times the backbone alone (no heads) truncated after each stage, for
temporal in {none, action-xla, action-mega}.  Differences between
consecutive truncations attribute time to each stage; the none-vs-action
delta per stage localizes the ACTION surplus docs/PERF.md chases.

Usage: python tools/bench_stages.py [batch] [mode ...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T, HW, ITERS = 8, 224, 8


def main():
    import jax
    import jax.numpy as jnp

    from ehgr_tpu.models.resnet import ResNetBackbone

    args = sys.argv[1:]
    batch = int(args[0]) if args and args[0].isdigit() else 64
    modes = [a for a in args if not a.isdigit()] or ["none", "xla", "mega"]

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch * T, HW, HW, 3)),
                    jnp.bfloat16)

    for mode in modes:
        bb = ResNetBackbone(
            temporal=("none" if mode == "none" else "action"),
            n_segment=T, partial_bn=False,
            action_fused=("mega" if mode == "mega" else None),
            dtype=jnp.bfloat16)
        init_fn = jax.jit(lambda r, v: bb.init(r, v, train=False),
                          static_argnums=())
        variables = jax.block_until_ready(
            init_fn({"params": jax.random.key(0)}, x))
        prev = 0.0
        for stage in (1, 2, 3, 4):
            @jax.jit
            def run(v, stage=stage):
                taps = bb.apply(variables, v, train=False, max_stage=stage)
                return taps[f"layer{stage}"].sum()  # tiny reduce, forces all

            run(x).block_until_ready()
            t0 = time.perf_counter()
            for _ in range(ITERS):
                r = run(x)
            r.block_until_ready()
            dt = (time.perf_counter() - t0) / ITERS * 1e3
            print(f"{mode:5s} stage<= {stage}: {dt:8.2f} ms  "
                  f"(stage {stage} alone: {dt - prev:7.2f} ms)", flush=True)
            prev = dt


if __name__ == "__main__":
    main()
