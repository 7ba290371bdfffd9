"""Stage-2 self-distillation trainer CLI (ref ``train_sd.py``; recipe
``sh/train_ego.sh:16``): per-exit CE + KD(T=3) + masked-L2 hints, initialized
non-strict from a Stage-1 checkpoint via --checkpoint_path.

  python -m cli.train_sd --preset ego_sd --checkpoint_path <mtmm ckpt> \
      --annot_path <dir> [--synthetic]
"""

import sys


def main(argv=None):
    from ehgr_tpu.configs import config_from_args
    from ehgr_tpu.data.factory import build_train_datasets
    from ehgr_tpu.train.loop import run_training

    cfg = config_from_args(argv if argv is not None else sys.argv[1:],
                           default_preset="ego_sd")
    train_ds, val_ds = build_train_datasets(cfg, "sd")
    return run_training(cfg, "sd", train_ds, val_ds)


if __name__ == "__main__":
    print(main())
