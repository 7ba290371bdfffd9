"""Baseline ACTION-Net trainer CLI (ref ``train.py``; recipe
``sh/train_ego.sh:4``).

  python -m cli.train --preset ego_baseline --annot_path <dir> [--synthetic]
"""

import sys


def main(argv=None):
    from ehgr_tpu.configs import config_from_args
    from ehgr_tpu.data.factory import build_train_datasets
    from ehgr_tpu.train.loop import run_training

    cfg = config_from_args(argv if argv is not None else sys.argv[1:],
                           default_preset="ego_baseline")
    train_ds, val_ds = build_train_datasets(cfg, "baseline")
    return run_training(cfg, "baseline", train_ds, val_ds)


if __name__ == "__main__":
    print(main())
