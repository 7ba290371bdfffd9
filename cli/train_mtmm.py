"""Stage-1 MTMM trainer CLI (ref ``train_mtmm.py``; recipe
``sh/train_ego.sh:13``): CE + 0.01 * MSE on next-segment depth.

  python -m cli.train_mtmm --preset ego_mtmm --modal rgb_depth \
      --annot_path <dir> [--synthetic]
"""

import sys


def main(argv=None):
    from ehgr_tpu.configs import config_from_args
    from ehgr_tpu.data.factory import build_train_datasets
    from ehgr_tpu.train.loop import run_training

    cfg = config_from_args(argv if argv is not None else sys.argv[1:],
                           default_preset="ego_mtmm")
    train_ds, val_ds = build_train_datasets(cfg, "mtmm")
    return run_training(cfg, "mtmm", train_ds, val_ds)


if __name__ == "__main__":
    print(main())
