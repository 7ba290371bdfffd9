"""Per-site ACTION timing at each ResNet-50 layer shape (real chip).

Times ONE ActionConv site (full module: shift + 3 gates + wrapped 1x1 conv)
with the XLA formulation vs the Pallas megakernel vs a bare 1x1 conv, looped
in-graph (lax.scan, 20 iters) so the ~30 ms tunnel dispatch floor amortizes
out (CLAUDE.md).  F=C so iterations chain (prevents XLA hoisting the loop
body); the xla-vs-mega comparison is apples-to-apples.

Usage: python tools/bench_action_site.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ResNet-50 ACTION-site input shapes at 224^2 (H, W, C)
SHAPES = {
    "l1b0": (56, 56, 64),
    "l1b1": (56, 56, 256),
    "l2b1": (28, 28, 512),
    "l3b1": (14, 14, 1024),
    "l4b1": (7, 7, 2048),
}
T, ITERS = 8, 20


def bench_site(name, hw_c, batch, mode):
    import jax
    import jax.numpy as jnp

    from ehgr_tpu.ops.action import ActionConv

    h, w, c = hw_c
    nt = batch * T
    if mode == "conv":
        from flax import linen as nn

        class Bare(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                return nn.Conv(c, (1, 1), use_bias=False,
                               dtype=jnp.bfloat16, name="net")(x)

        model = Bare()
    else:
        model = ActionConv(features=c, n_segment=T, dtype=jnp.bfloat16,
                           fused=("mega" if mode == "mega" else None))
    x0 = jnp.zeros((nt, h, w, c), jnp.bfloat16)
    init_fn = jax.jit(lambda r, x: model.init(r, x, train=False))
    variables = jax.block_until_ready(
        init_fn({"params": jax.random.key(0)}, x0))

    @jax.jit
    def run(x):
        def body(carry, _):
            y = model.apply(variables, carry, train=False)
            return y.astype(carry.dtype), ()

        out, _ = jax.lax.scan(body, x, None, length=ITERS)
        return out

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((nt, h, w, c)), jnp.bfloat16)
    run(x).block_until_ready()                      # compile + warm
    t0 = time.perf_counter()
    run(x).block_until_ready()
    run(x).block_until_ready()
    dt = (time.perf_counter() - t0) / (2 * ITERS)
    gb = 2 * nt * h * w * c * 2 / 1e9               # in + out, bf16
    print(f"{name} {mode:5s} {dt * 1e3:8.3f} ms/site   "
          f"({gb / dt:.0f} GB/s apparent)", flush=True)
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    for name, hw_c in SHAPES.items():
        for mode in ("conv", "xla", "mega"):
            bench_site(name, hw_c, batch, mode)


if __name__ == "__main__":
    main()
