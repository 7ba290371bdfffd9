"""Multi-clip evaluation CLI (ref ``test.py``): 10 random clips per video,
softmax-mean voting, top-1/5 + confusion matrix.

  python -m cli.test --preset ego_baseline --checkpoint_path <ckpt> \
      --annot_path <dir> [--synthetic]
"""

import sys


def main(argv=None):
    from ehgr_tpu.configs import config_from_args
    from ehgr_tpu.eval.runner import run_test

    cfg = config_from_args(argv if argv is not None else sys.argv[1:],
                           default_preset="ego_baseline")
    res = run_test(cfg, arch="tsn", heads=1)
    res.pop("confusion", None)
    return res


if __name__ == "__main__":
    print(main())
