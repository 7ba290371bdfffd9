"""SlowOnly baseline trainer CLI (ref ``train_slowonly.py``; recipe
``sh/train_ego.sh:7``): SlowFast Slow-pathway R50, single param-group SGD.

  python -m cli.train_slowonly --preset ego_baseline --annot_path <dir> \
      [--synthetic]
"""

import dataclasses
import sys


def main(argv=None):
    from ehgr_tpu.configs import config_from_args
    from ehgr_tpu.data.factory import build_train_datasets
    from ehgr_tpu.train.loop import run_training

    cfg = config_from_args(argv if argv is not None else sys.argv[1:],
                           default_preset="ego_baseline")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, arch="slowonly"),
        optim=dataclasses.replace(cfg.optim, policies=False),
    ).validate()
    train_ds, val_ds = build_train_datasets(cfg, "baseline")
    return run_training(cfg, "baseline", train_ds, val_ds)


if __name__ == "__main__":
    print(main())
