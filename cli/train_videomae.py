"""VideoMAE fine-tune CLI (ref ``train_videomae.py``: HF Trainer over
``VideoMAEForVideoClassification``, 16-frame clips).  Here the same
architecture runs TPU-native; pass ``--checkpoint_path`` pointing at an HF
torch checkpoint to initialize from pretraining (converted via
``ehgr_tpu.models.videomae.convert_hf_videomae``).

  python -m cli.train_videomae --preset ego_baseline --clip_len 16 \
      --annot_path <dir> [--synthetic]
"""

import dataclasses
import sys


def main(argv=None):
    from ehgr_tpu.configs import config_from_args
    from ehgr_tpu.data.factory import build_train_datasets
    from ehgr_tpu.train.loop import run_training

    cfg = config_from_args(argv if argv is not None else sys.argv[1:],
                           default_preset="ego_baseline")
    clip_len = cfg.data.clip_len if cfg.data.clip_len % 2 == 0 else 16
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, clip_len=clip_len),
        model=dataclasses.replace(cfg.model, arch="videomae",
                                  num_segments=clip_len, is_shift=False),
        optim=dataclasses.replace(cfg.optim, policies=False),
    ).validate()
    train_ds, val_ds = build_train_datasets(cfg, "baseline")
    return run_training(cfg, "baseline", train_ds, val_ds)


if __name__ == "__main__":
    print(main())
