"""Qualitative case-study exporter CLI (ref ``case_study.py``).

  python -m cli.case_study --preset ego_baseline --checkpoint_path <ckpt> \
      --annot_path <dir> [--synthetic]
"""

import os
import sys


def main(argv=None):
    from ehgr_tpu.configs import config_from_args
    from ehgr_tpu.data.factory import build_test_dataset
    from ehgr_tpu.eval.case_study import export_case_study
    from ehgr_tpu.eval.runner import _build_model

    cfg = config_from_args(argv if argv is not None else sys.argv[1:],
                           default_preset="ego_baseline")
    model, variables = _build_model(cfg, "tsn")
    dataset = build_test_dataset(cfg)
    out_dir = os.path.join(cfg.run.run_dir, "case_study")
    return export_case_study(model, variables, dataset, out_dir)


if __name__ == "__main__":
    print(main())
