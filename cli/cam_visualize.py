"""GradCAM visualization CLI (ref ``cam_visualize.py``): per-frame CAM
overlays over layer4 (or a middle exit) exported as JPEG + GIF.

  python -m cli.cam_visualize --preset ego_baseline \
      --checkpoint_path <ckpt> --annot_path <dir> [--synthetic]
"""

import os
import sys


def main(argv=None):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ehgr_tpu.configs import config_from_args
    from ehgr_tpu.data.factory import build_test_dataset
    from ehgr_tpu.eval.gradcam import gradcam, overlay_cam
    from ehgr_tpu.eval.runner import _build_model
    from ehgr_tpu.ops.preprocess_device import normalize_clip

    cfg = config_from_args(argv if argv is not None else sys.argv[1:],
                           default_preset="ego_baseline")
    model, variables = _build_model(cfg, "tsn")
    dataset = build_test_dataset(cfg)
    out_dir = os.path.join(cfg.run.run_dir, "cam")
    os.makedirs(out_dir, exist_ok=True)

    records = []
    for idx in range(min(5, len(dataset))):
        sample = dataset[idx]
        frames = sample["rgb"][0]                       # first clip [T,H,W,3]
        clip = normalize_clip(jnp.asarray(frames[None]), cfg.data.mean,
                              cfg.data.std)
        cams, logits = gradcam(model, variables, clip)
        imgs = [Image.fromarray(overlay_cam(frames[t], cams[t]))
                for t in range(frames.shape[0])]
        gif = os.path.join(out_dir, f"cam{idx:03d}.gif")
        imgs[0].save(gif, save_all=True, append_images=imgs[1:],
                     duration=150, loop=0)
        records.append({"video": idx, "pred": int(np.argmax(logits[0])),
                        "label": int(sample["label"]), "gif": gif})
    return records


if __name__ == "__main__":
    print(main())
