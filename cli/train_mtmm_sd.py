"""Joint MTMM+SD trainer CLI (ref ``train_mtmm_sd.py``; recipe
``sh/train_ego.sh:20``): SD losses + current-clip depth MSE, single backbone
traversal (the reference runs its feature extractor twice —
``models_MTMM_SD.py:492`` — fixed here).

  python -m cli.train_mtmm_sd --preset ego_mtmm_sd --annot_path <dir>
"""

import sys


def main(argv=None):
    from ehgr_tpu.configs import config_from_args
    from ehgr_tpu.data.factory import build_train_datasets
    from ehgr_tpu.train.loop import run_training

    cfg = config_from_args(argv if argv is not None else sys.argv[1:],
                           default_preset="ego_mtmm_sd")
    train_ds, val_ds = build_train_datasets(cfg, "mtmm_sd")
    return run_training(cfg, "mtmm_sd", train_ds, val_ds)


if __name__ == "__main__":
    print(main())
