"""Isolated kernel timings for the ACTION megakernel sweeps (real chip).

Times each raw op in an in-graph scan at one layer shape, to attribute the
per-site cost measured by bench_action_site.py:

  conv    XLA 1x1 conv (the wrapped net alone — the apply sweep's floor)
  xshift  XLA learnable_shift (materializes x_shift)
  lshift  Pallas whole-T-slab shift kernel (ops/pallas/shift.py)
  stats   action_stats sweep alone
  apply   action_apply sweep alone (gates + matmul)

Usage: python tools/bench_action_kernels.py [H W C [batch]]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T, ITERS = 8, 20


def main():
    import jax
    import jax.numpy as jnp

    from ehgr_tpu.ops.pallas.action_mega import action_apply, action_stats
    from ehgr_tpu.ops.pallas.shift import learnable_shift_pallas
    from ehgr_tpu.ops.temporal_shift import learnable_shift, tsm_shift_init

    if len(sys.argv) >= 4:
        h, w, c = map(int, sys.argv[1:4])
        batch = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    else:
        h, w, c, batch = 56, 56, 256, 64

    s = h * w
    rng = np.random.default_rng(0)
    x4 = jnp.asarray(rng.standard_normal((batch, T, s, c)), jnp.bfloat16)
    wsh = tsm_shift_init(c).astype(jnp.bfloat16)
    wp3 = jnp.asarray(rng.standard_normal((c, c // 16)) * 0.05, jnp.bfloat16)
    wn = jnp.asarray(rng.standard_normal((c, c)) * 0.05, jnp.bfloat16)
    g1 = jnp.asarray(rng.uniform(0, 1, (batch, T, s, 1)), jnp.bfloat16)
    gch = jnp.asarray(rng.uniform(3, 5, (batch, T, c)), jnp.bfloat16)

    def scan(fn):
        @jax.jit
        def run(x):
            def body(carry, _):
                return fn(carry).astype(carry.dtype), ()
            out, _ = jax.lax.scan(body, x, None, length=ITERS)
            return out
        return run

    x5 = lambda x: x.reshape(batch, T, h, w, c)

    ops = {
        "conv": scan(lambda x: jnp.dot(
            x.reshape(-1, c), wn,
            preferred_element_type=jnp.float32).reshape(x.shape)),
        "xshift": scan(lambda x: learnable_shift(x5(x), wsh).reshape(x.shape)),
        "lshift": scan(lambda x: learnable_shift_pallas(
            x5(x), wsh).reshape(x.shape)),
        "stats": scan(lambda x: x + action_stats(x, wsh, wp3)[0] * 0.001),
        "apply": scan(lambda x: action_apply(x, wsh, g1, gch, wn)),
    }

    gb = 2 * batch * T * s * c * 2 / 1e9
    print(f"shape [{batch}x{T}, {h}x{w}, {c}]  (in+out {gb:.2f} GB)",
          flush=True)
    for name, run in ops.items():
        run(x4).block_until_ready()
        t0 = time.perf_counter()
        run(x4).block_until_ready()
        run(x4).block_until_ready()
        dt = (time.perf_counter() - t0) / (2 * ITERS)
        print(f"  {name:7s} {dt * 1e3:8.3f} ms   ({gb / dt:.0f} GB/s)",
              flush=True)


if __name__ == "__main__":
    main()
