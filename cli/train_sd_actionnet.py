"""SD-from-ACTION-Net trainer CLI (ref ``train_sd_actionnet.py``; recipe
``sh/train_ego.sh:17``): identical loss structure to train_sd but the
teacher weights come from a plain baseline (83-class ACTION-Net) checkpoint
rather than an MTMM one — the distinction is purely which checkpoint you
pass (the reference keeps a 1245-line near-clone model file for this;
here it is the same TSN-SD model).

  python -m cli.train_sd_actionnet --preset ego_sd \
      --checkpoint_path <baseline ckpt> --annot_path <dir> [--synthetic]
"""

import sys

from cli.train_sd import main as _main


def main(argv=None):
    return _main(argv)


if __name__ == "__main__":
    print(main(sys.argv[1:]))
