"""Slimmer SD evaluation CLI (ref ``test_sd_actionnet.py``: per-exit top-1/5
without confusion matrices).

  python -m cli.test_sd_actionnet --preset ego_sd --checkpoint_path <ckpt> \
      --annot_path <dir> [--synthetic]
"""

import sys


def main(argv=None):
    from ehgr_tpu.configs import config_from_args
    from ehgr_tpu.eval.runner import run_test

    cfg = config_from_args(argv if argv is not None else sys.argv[1:],
                           default_preset="ego_sd")
    res = run_test(cfg, arch="tsn_sd", heads=4)
    res.pop("confusion", None)
    return res


if __name__ == "__main__":
    print(main())
