"""Host decode throughput: native C++ loader vs PIL (docs/PERF.md data).

Builds a synthetic EgoGesture-layout tree at protocol geometry (640x480
JPEG frames, the datasets' native size), then times the full train decode
chain (scale 224 -> multi-scale crop 224 -> uint8 clip) through both
backends.

Usage: python tools/bench_native_io.py [n_clips] [clip_len]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from PIL import Image

    from ehgr_tpu.data import native_io
    from ehgr_tpu.data.datasets import _decode
    from ehgr_tpu.ops import spatial_transforms as st

    tmp = tempfile.mkdtemp(prefix="nio_bench_")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(t):
        a = rng.integers(0, 256, (480, 640, 3), np.uint8)
        p = os.path.join(tmp, f"{i:06d}.jpg")
        Image.fromarray(a).save(p, quality=90)
        paths.append(p)
    sel = np.arange(t)

    def chain(seed):
        return st.Compose([st.GroupScale([224, 224]),
                           st.GroupMultiScaleCrop([224, 224],
                                                  rng=np.random.default_rng(
                                                      seed))])

    for backend in ("pil", "native", "native_fast"):
        # warmup (also builds the .so)
        _decode(paths, sel, "RGB", chain(0), backend=backend)
        t0 = time.perf_counter()
        for k in range(n_clips):
            _decode(paths, sel, "RGB", chain(k), backend=backend)
        dt = time.perf_counter() - t0
        print(f"{backend:12s} {n_clips / dt:7.2f} clips/s   "
              f"({dt / n_clips * 1e3:.1f} ms/clip, T={t}, 640x480->224)",
              flush=True)
    assert native_io.available()


if __name__ == "__main__":
    main()
