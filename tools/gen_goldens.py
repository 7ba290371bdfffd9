"""Generate golden-logit anchors for tests/test_regression.py (VERDICT r2
next #7): tsn, tsn_mtmm, tsn_mtmm_sd, action_stages=(4,), int8-static.

Prints python literals to paste into the test.  Run on the CPU backend so
goldens match the test environment bit-for-bit.
"""

import numpy as np
import torch  # noqa: F401  (torch before jax; CLAUDE.md)
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from ehgr_tpu.models.tsn import variant  # noqa: E402

CLS, T, HW = 5, 4, 32


def x_input():
    return jnp.asarray(
        np.linspace(-1, 1, 2 * T * HW * HW * 3, dtype=np.float32)
        .reshape(2, T, HW, HW, 3))


def show(name, arr, k=5):
    vals = np.asarray(arr, np.float64).reshape(-1)[:k]
    print(f"{name} = {vals.tolist()!r}")


def main():
    x = x_input()

    def build(name, **kw):
        m = variant(name, num_class=CLS, num_segments=T,
                    temporal=kw.pop("temporal", "action"),
                    partial_bn=False, **kw)
        v = jax.jit(lambda r, xx: m.init(r, xx, train=False))(
            {"params": jax.random.key(42)}, x)
        return m, v

    m, v = build("tsn")
    show("GOLD_TSN", m.apply(v, x, train=False)[0])

    m, v = build("tsn_mtmm")
    out = m.apply(v, x, train=False)
    show("GOLD_MTMM_LOGITS", out[0][0])
    show("GOLD_MTMM_DEPTH", out[1].reshape(-1))

    m, v = build("tsn_mtmm_sd")
    out = m.apply(v, x, train=False)   # 8-tuple SD + (local, global) depth
    assert len(out) == 10, len(out)
    show("GOLD_MTMMSD_FINAL", out[0][0])
    show("GOLD_MTMMSD_GDEPTH", out[9].reshape(-1))

    m, v = build("tsn", action_stages=(4,))
    show("GOLD_TSN_STAGE4", m.apply(v, x, train=False)[0])

    # int8 static path: calibrate on the same input, then static apply
    import dataclasses

    from ehgr_tpu.ops.quantize import calibrate

    m, v = build("tsn", quantize="static")
    cm = dataclasses.replace(m, quantize="calib")
    v = calibrate(cm, v, [x])
    show("GOLD_TSN_INT8", m.apply(v, x, train=False)[0])


if __name__ == "__main__":
    main()
