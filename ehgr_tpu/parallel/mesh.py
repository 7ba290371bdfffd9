"""Device mesh + sharding helpers.

Design (scaling-book recipe): pick a mesh, annotate input/param shardings,
let GSPMD insert the collectives.  For this workload (ResNet-50 on 8-frame
clips) the natural layout is:

* ``data`` axis — shard the clip batch ``[N, ...]``; gradient all-reduce is
  the only cross-device traffic in the common case (rides ICI).
* ``model`` axis (optional, >1 chips) — shards the 2048-wide classifier /
  exit heads and the widest decoder convs.  TP/PP/SP/EP beyond that is
  out of scope by design: the model is 25M params on T=8 clips
  (SURVEY.md §2.4), so there is nothing to pipeline or sequence-shard.

BatchNorm note: batch statistics under ``jit`` + sharded inputs are GLOBAL
means (XLA turns ``jnp.mean`` over a sharded axis into a psum), which is
*sync-BN for free* — stronger than the reference's per-device stats, and
exactly what partial-BN wants since only the stem BN is live.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (clip-batch) axis over ``data``."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def head_sharding(mesh: Mesh) -> NamedSharding:
    """Tensor-parallel classifier head: shard the class dim over ``model``."""
    return NamedSharding(mesh, P(None, MODEL_AXIS))


def shard_batch(batch, mesh: Mesh):
    """Device_put a pytree of host arrays with the batch axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def param_shardings(variables, mesh: Mesh, model_parallel: bool = False):
    """Sharding tree for model variables.

    Default: fully replicated (pure data parallelism).  With
    ``model_parallel=True``, the classifier-head kernels (``new_fc``,
    ``middle_fc{1,2,3}``) shard their output (class/feature) dim over
    ``model`` — GSPMD all-gathers the tiny logit shards after the matmul."""
    repl = replicated(mesh)
    head = head_sharding(mesh)
    bias_head = NamedSharding(mesh, P(MODEL_AXIS))
    mp = mesh.shape[MODEL_AXIS]

    def assign(path, leaf):
        if not model_parallel:
            return repl
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if any(n in ("new_fc", "middle_fc1", "middle_fc2", "middle_fc3")
               for n in names):
            # shard the class dim only when it divides the model axis
            if np.shape(leaf)[-1] % mp == 0:
                return head if np.ndim(leaf) == 2 else bias_head
        return repl

    return jax.tree_util.tree_map_with_path(assign, variables)
