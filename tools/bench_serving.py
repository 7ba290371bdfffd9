"""Close the serving loop ON THE REAL CHIP (VERDICT r3 next #4).

Round 2 built the ``.ehgrx`` AOT artifact format (serve/export.py) but only
ever exercised it on the CPU mesh.  This tool proves the deploy story's
last link on real hardware, in one chip session:

1. export the headline scorer (TSN+ACTION ResNet-50 bf16, on-device
   normalize, pre-cropped clip contract) with ``platforms=("tpu",)`` at the
   throughput batch and at batch 1;
2. reload each artifact with ``load_artifact`` — the deserialized StableHLO
   program, no model code — and run it on the chip;
3. measure artifact throughput + p50 latency NEXT TO the live-jit path of
   the identical program in the same process (same batches, same sync
   discipline);
4. time the streaming window scorer (eval/streaming.py) on device: per-window
   client-observed latency -> real-time factor at the default 30 fps /
   stride-8 cadence (a window fires every 267 ms).

Results go to a VERSION-CONTROLLED path by default (VERDICT r3 next #7);
artifacts themselves (weights baked in, ~50 MB) stay in /tmp.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_serving.py
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np
import torch  # noqa: F401  (torch before jax; CLAUDE.md)
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/ehgr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

T, HW, CLS = 8, 224, 83
MEAN, STD = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)


def _throughput(fn, batch_arr, warmup=3, iters=10):
    for _ in range(warmup):
        r = fn(batch_arr)
    float(jnp.sum(r))                          # hard sync (CLAUDE.md)
    t0 = time.perf_counter()
    outs = [fn(batch_arr) for _ in range(iters)]
    float(jnp.sum(outs[-1]))
    return batch_arr.shape[0] * iters / (time.perf_counter() - t0)


def _latency(fn, clip_arr, warmup=3, iters=30):
    for _ in range(warmup):
        np.asarray(fn(clip_arr))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(clip_arr))               # materialize = client-observed
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.percentile(times, 50)), float(np.percentile(times, 99))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=384)
    p.add_argument("--artifact_dir", default="/tmp/ehgr_artifacts")
    p.add_argument("--out", default="runs/round4_serving.json")
    p.add_argument("--stream_windows", type=int, default=30)
    args = p.parse_args(argv)

    from ehgr_tpu.eval.streaming import StreamingRecognizer, \
        make_stream_score_fn
    from ehgr_tpu.models.tsn import variant
    from ehgr_tpu.serve.export import (export_artifact, load_artifact,
                                       make_clip_scorer, save_artifact)

    platform = jax.devices()[0].platform
    print(f"[serving] device={jax.devices()[0]} platform={platform}",
          flush=True)

    model = variant("tsn", num_class=CLS, num_segments=T,
                    base_model="resnet50", temporal="action",
                    partial_bn=False, dtype=jnp.bfloat16)
    x0 = jnp.zeros((2, T, HW, HW, 3), jnp.float32)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        {"params": jax.random.key(0)}, x0)

    live = make_clip_scorer(model, variables, mean=MEAN, std=STD)

    # --- export for TPU + reload (no model code) -------------------------
    os.makedirs(args.artifact_dir, exist_ok=True)
    rec = {"tool": "bench_serving", "ts": time.strftime("%F %T"),
           "device": str(jax.devices()[0]), "platform": platform,
           "batch": args.batch}
    arts = {}
    t0 = time.perf_counter()
    for name, b in (("throughput", args.batch), ("latency", 1)):
        path = os.path.join(args.artifact_dir, f"tsn_b{b}.ehgrx")
        exported = export_artifact(live, (b, T, HW, HW, 3),
                                   platforms=(platform,))
        nbytes = save_artifact(path, exported,
                               {"arch": "tsn", "num_segments": T,
                                "crop_size": HW, "num_classes": CLS})
        arts[name] = path
        rec[f"artifact_{name}_mb"] = round(nbytes / 2**20, 1)
        print(f"[serving] exported {path} ({nbytes / 2**20:.1f} MB)",
              flush=True)
    rec["export_wall_s"] = round(time.perf_counter() - t0, 1)

    aot_tp, m_tp = load_artifact(arts["throughput"])
    aot_lat, _ = load_artifact(arts["latency"])
    rec["manifest_platforms"] = m_tp["platforms"]

    # --- throughput: AOT artifact vs live jit, same batch ---------------
    rng = np.random.default_rng(5)
    big = jnp.asarray(rng.integers(0, 256, (args.batch, T, HW, HW, 3)),
                      jnp.uint8)
    one = jnp.asarray(rng.integers(0, 256, (1, T, HW, HW, 3)), jnp.uint8)

    aot_cps = _throughput(aot_tp, big)
    print(f"[serving] AOT artifact: {aot_cps:.1f} clips/s", flush=True)
    live_cps = _throughput(live, big)
    print(f"[serving] live jit:     {live_cps:.1f} clips/s", flush=True)
    aot_p50, aot_p99 = _latency(aot_lat, one)
    live_p50, live_p99 = _latency(live, one)
    rec.update({
        "aot_clips_per_s": round(aot_cps, 1),
        "live_clips_per_s": round(live_cps, 1),
        "aot_vs_live": round(aot_cps / live_cps, 3),
        "aot_p50_ms": round(aot_p50, 2), "aot_p99_ms": round(aot_p99, 2),
        "live_p50_ms": round(live_p50, 2), "live_p99_ms": round(live_p99, 2),
    })

    # numerical identity: same program, same weights
    d = float(jnp.max(jnp.abs(aot_lat(one) - live(one))))
    rec["aot_live_max_abs_diff"] = d
    print(f"[serving] AOT vs live max|diff| = {d:.2e}", flush=True)

    # --- streaming window scorer on device -------------------------------
    stream_fn = make_stream_score_fn(model, variables, crop_size=HW)
    frame = np.asarray(rng.integers(0, 256, (HW, HW, 3)), np.uint8)
    recog = StreamingRecognizer(stream_fn, num_segments=T, window=32,
                                stride=8)
    for _ in range(40):                        # warm: fills buffer + compiles
        recog.push(frame)
    times = []
    fired = 0
    while fired < args.stream_windows:
        for _ in range(recog.stride - 1):
            recog.push(frame)
        t0 = time.perf_counter()
        recog.push(frame)                      # this push fires a window
        times.append((time.perf_counter() - t0) * 1e3)
        fired += 1
    win_p50 = float(np.percentile(times, 50))
    win_p99 = float(np.percentile(times, 99))
    budget_ms = recog.stride / 30.0 * 1e3      # window cadence at 30 fps
    rec.update({
        "stream_window_p50_ms": round(win_p50, 2),
        "stream_window_p99_ms": round(win_p99, 2),
        "stream_budget_ms_30fps": round(budget_ms, 1),
        "stream_realtime_factor": round(budget_ms / win_p50, 2),
        "stream_realtime": bool(win_p50 < budget_ms),
    })
    print(f"[serving] stream window p50={win_p50:.1f} ms "
          f"(budget {budget_ms:.0f} ms @30fps stride 8, "
          f"rtf {budget_ms / win_p50:.1f}x)", flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    main()
