"""Early-exit cascade evaluation CLI — the dynamic deployment surface.

Where ``cli/test_sd.py`` scores every exit and ``tsn_middle{K}`` deploys one
fixed truncation (ref ``models_SD.py:434-1232``), this verb evaluates the
confidence-gated cascade (exit-K for every video, full net only below a
confidence threshold) and prints the whole threshold operating curve.

  python -m cli.test_cascade --preset ego_sd --checkpoint_path <sd_ckpt> \
      [--synthetic] [--cascade_exit 1]
"""

import sys


def main(argv=None):
    args = list(argv if argv is not None else sys.argv[1:])
    exit_k = 1
    if "--cascade_exit" in args:
        i = args.index("--cascade_exit")
        exit_k = int(args[i + 1])
        del args[i:i + 2]

    from ehgr_tpu.configs import config_from_args
    from ehgr_tpu.eval.cascade import run_cascade_test

    cfg = config_from_args(args, default_preset="ego_sd")
    return run_cascade_test(cfg, exit_k=exit_k)


if __name__ == "__main__":
    print(main())
