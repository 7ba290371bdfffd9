"""Checkpoint save/restore (orbax) + cross-stage weight transfer.

Reference behavior replicated (``utils.py:24-36``, ``train_mtmm.py:590-607``):
per-epoch ``latest`` plus ``best`` / ``ema_best`` keyed on val top-1, and
non-strict loading so Stage-2 SD models absorb Stage-1 MTMM weights while the
new exit branches keep their init (``train_sd.py:644-647``).

Two ingestion paths:
* orbax checkpoints written by this framework,
* converted torch ``*.pth.tar`` reference checkpoints
  (``ehgr_tpu.models.torch_import``) for parity testing.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import jax
import orbax.checkpoint as ocp
from flax.traverse_util import flatten_dict, unflatten_dict


def merge_variables(dst: Dict, src: Dict, verbose: bool = False
                    ) -> Tuple[Dict, list]:
    """Non-strict weight transfer: copy every leaf of ``src`` whose path and
    shape exist in ``dst`` (the JAX analogue of
    ``load_state_dict(strict=False)``).  Returns (merged, skipped_paths)."""
    fdst = flatten_dict(dst)
    fsrc = flatten_dict(src)
    skipped = []
    for path, leaf in fsrc.items():
        if path in fdst and jax.numpy.shape(fdst[path]) == jax.numpy.shape(leaf):
            fdst[path] = leaf
        else:
            skipped.append(path)
    return unflatten_dict(fdst), skipped


class CheckpointManager:
    """Thin orbax wrapper with the reference's best/ema-best naming."""

    def __init__(self, run_dir: str, model_name: str):
        self.run_dir = os.path.abspath(run_dir)
        self.model_name = model_name
        os.makedirs(self.run_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, tag: str) -> str:
        return os.path.join(self.run_dir, f"{self.model_name}_{tag}_ckpt")

    def save(self, tag: str, state) -> str:
        path = self._path(tag)
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        return path

    def restore(self, tag: str, target):
        return self._ckptr.restore(self._path(tag), target)

    def exists(self, tag: str) -> bool:
        return os.path.isdir(self._path(tag))


def load_for_model(path: str, variables: Dict, strict: bool = False) -> Dict:
    """Load weights from either an orbax dir or a torch .pth(.tar) file into
    an initialized variable tree (non-strict by default)."""
    if os.path.isdir(path):
        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(os.path.abspath(path))  # orbax rejects
            # relative paths at restore time (save abspaths in the manager)
        # full TrainState checkpoints: pull the variable collections out
        if "params" in restored and "step" in restored:
            src = {"params": restored["params"],
                   "batch_stats": restored.get("batch_stats", {})}
        else:
            src = restored
        merged, skipped = merge_variables(dict(variables), src)
        if strict and skipped:
            raise KeyError(f"checkpoint paths not absorbed: {skipped[:10]}")
        return merged
    from ehgr_tpu.models.torch_import import load_torch_checkpoint

    new_vars, missing = load_torch_checkpoint(path, variables, strict=strict)
    return new_vars
