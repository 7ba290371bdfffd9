"""Int8 conv ceiling on this chip (docs/PERF.md round-2 plan).

Times representative ResNet-50 convs in bf16 vs int8 (int8 operands,
int32 accumulation) chained in one in-graph scan (amortizes the ~30 ms
tunnel dispatch floor), to decide whether a quantized inference path is
worth building.  v5e's MXU runs int8 at 2x the bf16 rate when XLA lowers
to it.

Usage: python tools/bench_int8.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (name, H, W, C, k) — square Cin==Cout so scan iterations chain
SHAPES = [
    ("l1_3x3", 56, 56, 64, 3),
    ("l2_3x3", 28, 28, 128, 3),
    ("l3_3x3", 14, 14, 256, 3),
    ("l4_3x3", 7, 7, 512, 3),
    ("l1_1x1", 56, 56, 256, 1),
    ("l3_1x1", 14, 14, 1024, 1),
]
ITERS, CALLS = 20, 3


def main():
    import jax
    import jax.numpy as jnp

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512  # N*T

    rng = np.random.default_rng(0)
    for name, h, w, c, k in SHAPES:
        scale = 1.0 / np.sqrt(c * k * k)       # keeps magnitudes ~O(1)
        xf = jnp.asarray(rng.standard_normal((batch, h, w, c)), jnp.bfloat16)
        wf = jnp.asarray(rng.standard_normal((k, k, c, c)) * scale,
                         jnp.bfloat16)
        xi = jnp.asarray(rng.integers(-127, 128, (batch, h, w, c)), jnp.int8)
        wi = jnp.asarray(rng.integers(-127, 128, (k, k, c, c)), jnp.int8)

        @jax.jit
        def chain_f(cin, wgt):
            def body(cc, _):
                y = jax.lax.conv_general_dilated(
                    cc, wgt, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32)
                return y.astype(cc.dtype), ()
            out, _ = jax.lax.scan(body, cin, None, length=ITERS)
            return jnp.sum(out.astype(jnp.float32))

        @jax.jit
        def chain_i(cin, wgt):
            def body(cc, _):
                y = jax.lax.conv_general_dilated(
                    cc, wgt, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
                # rescale into int8 range; keeps values live, no underflow
                return jax.lax.shift_right_arithmetic(
                    y, jnp.asarray(10, y.dtype)).astype(jnp.int8), ()
            out, _ = jax.lax.scan(body, cin, None, length=ITERS)
            return jnp.sum(out.astype(jnp.float32))

        results = {}
        for tag, fn, a, b in (("bf16", chain_f, xf, wf),
                              ("int8", chain_i, xi, wi)):
            float(fn(a, b))                    # compile + warm, hard sync
            t0 = time.perf_counter()
            for _ in range(CALLS):
                r = fn(a, b)
            float(r)                           # scalar fetch = real barrier
            results[tag] = ((time.perf_counter() - t0) / CALLS / ITERS) * 1e3
        flops = 2 * batch * h * w * c * c * k * k
        tb, ti = results["bf16"], results["int8"]
        print(f"{name:8s} bf16 {tb:7.3f} ms/conv ({flops / tb / 1e9:6.1f} "
              f"TF/s)   int8 {ti:7.3f} ms/conv ({flops / ti / 1e9:6.1f} "
              f"TF/s)   speedup {tb / ti:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
