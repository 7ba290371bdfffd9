"""Streaming-recognition demo: drive the online recognizer over a frame
stream reconstructed from dataset clips (or pure synthetic frames).

Simulates a deployment stream — frames pushed one at a time, the
recognizer firing one static jitted window score every ``--stride``
frames and emitting debounced start/end events:

  python -m cli.stream_demo --preset ego_sd --synthetic \
      [--checkpoint_path <ckpt>] [--frames 256] [--stride 8] \
      [--threshold 0.6] [--cascade_exit 0]

``--cascade_exit K`` scores windows with the truncated ``tsn_middle{K}``
deploy model instead of the full net (the streaming+early-exit pairing).
"""

import sys
import time


def main(argv=None):
    args = list(argv if argv is not None else sys.argv[1:])

    def pop(flag, default, cast):
        if flag in args:
            i = args.index(flag)
            v = cast(args[i + 1])
            del args[i:i + 2]
            return v
        return default

    frames_n = pop("--frames", 256, int)
    stride = pop("--stride", 8, int)
    threshold = pop("--threshold", 0.6, float)
    exit_k = pop("--cascade_exit", 0, int)

    import numpy as np

    from ehgr_tpu.configs import config_from_args
    from ehgr_tpu.eval.runner import _build_model
    from ehgr_tpu.eval.streaming import (StreamingRecognizer,
                                         make_stream_score_fn)

    cfg = config_from_args(args, default_preset="ego_sd")
    arch = f"tsn_middle{exit_k}" if exit_k else "tsn"
    model, variables = _build_model(cfg, arch)
    fn = make_stream_score_fn(model, variables,
                              crop_size=cfg.data.crop_size,
                              dtype_name=cfg.model.dtype)
    rec = StreamingRecognizer(fn, num_segments=cfg.model.num_segments,
                              window=4 * cfg.model.num_segments,
                              stride=stride, threshold=threshold)

    # synthetic stream: per-class pixel bias segments, gesture-like
    rng = np.random.default_rng(cfg.run.seed)
    hw = cfg.data.crop_size
    events, t0 = [], time.perf_counter()
    cls = int(rng.integers(0, cfg.model.num_classes))
    for i in range(frames_n):
        if i % 64 == 0:
            cls = int(rng.integers(0, cfg.model.num_classes))
        frame = rng.integers(0, 256, (hw, hw, 3)).astype(np.uint8)
        frame[..., 0] = np.clip(frame[..., 0] * 0.5 + cls * 13, 0, 255)
        for ev in rec.push(frame):
            events.append(ev)
            print(f"frame {ev.frame_index:5d}: {ev.kind:5s} class "
                  f"{ev.label} (conf {ev.confidence:.2f})", flush=True)
    events += rec.flush()
    dt = time.perf_counter() - t0
    print(f"{frames_n} frames in {dt:.1f}s = {frames_n / dt:.1f} fps "
          f"({arch}, stride {stride}); {len(events)} events")
    return {"fps": frames_n / dt, "events": len(events), "arch": arch}


if __name__ == "__main__":
    main()
