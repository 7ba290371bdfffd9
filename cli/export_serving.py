"""Export a serving artifact: the full jitted scoring program (on-device
preprocess + backbone + clip vote) with weights baked in, serialized as one
StableHLO file a serving process reloads without model code (ehgr_tpu.serve).

  python -m cli.export_serving --preset ego_baseline --out model.ehgrx \
      [--arch tsn|tsn_middle2|...] [--checkpoint_path <ckpt>] \
      [--clip_num 10] [--videos 8|sym] [--platforms tpu,cpu] [--clip_scorer]

``--videos sym`` exports a symbolic batch dim (one artifact, any batch).
``--clip_scorer`` exports the pre-cropped ``[N,T,H,W,3] -> [N,C]`` deploy
contract instead of the full video protocol.
"""

import json
import sys


def main(argv=None):
    args = list(argv if argv is not None else sys.argv[1:])

    def pop(flag, default, cast=str):
        if flag in args:
            i = args.index(flag)
            v = cast(args[i + 1])
            del args[i:i + 2]
            return v
        return default

    def pop_flag(flag):
        if flag in args:
            args.remove(flag)
            return True
        return False

    out = pop("--out", "model.ehgrx")
    arch = pop("--arch", "tsn")
    clip_num = pop("--clip_num", 10, int)
    videos = pop("--videos", "8")
    platforms = pop("--platforms", "")
    clip_scorer = pop_flag("--clip_scorer")

    from ehgr_tpu.configs import config_from_args
    from ehgr_tpu.eval.runner import _build_model
    from ehgr_tpu.serve import (export_artifact, make_clip_scorer,
                                make_video_scorer, save_artifact,
                                symbolic_batch)

    cfg = config_from_args(args, default_preset="ego_baseline")
    model, variables = _build_model(cfg, arch)

    t, crop = cfg.model.num_segments, cfg.data.crop_size
    scale = cfg.data.scale_size
    if clip_scorer:
        fn = make_clip_scorer(model, variables, mean=cfg.data.mean,
                              std=cfg.data.std,
                              dtype_name=cfg.model.dtype)
        shape = (8, t, crop, crop, 3)
    else:
        # square resize = the EgoGesture protocol (test.py:204-207);
        # NvGesture short-side-resizes then crops (scale != crop)
        fn = make_video_scorer(model, variables, scale_size=scale,
                               crop_size=crop,
                               square_resize=(scale == crop),
                               dtype_name=cfg.model.dtype)
        shape = (8, clip_num, t, scale, scale, 3)
    if videos == "sym":
        shape = symbolic_batch(shape)
    else:
        shape = (int(videos),) + shape[1:]

    plats = tuple(filter(None, platforms.split(","))) or None
    exported = export_artifact(fn, shape, platforms=plats)
    manifest = {"arch": arch, "preset": None, "clip_scorer": clip_scorer,
                "num_segments": t, "crop_size": crop, "scale_size": scale,
                "num_classes": cfg.model.num_classes,
                "checkpoint": cfg.run.checkpoint_path or None}
    nbytes = save_artifact(out, exported, manifest)
    res = {"out": out, "bytes": nbytes, "arch": arch,
           "in_shape": [str(d) for d in shape],
           "platforms": list(exported.platforms)}
    print(json.dumps(res))
    return res


if __name__ == "__main__":
    main()
