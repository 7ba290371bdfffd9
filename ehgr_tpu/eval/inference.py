"""Multi-clip inference protocol — the benchmark path (ref ``test.py:117-166``).

Protocol: ``clip_num`` (default 10) random clips per video; per-clip softmax
averaged into one video-level distribution; top-1/5 + confusion matrix.

TPU re-design: instead of the reference's one-video-at-a-time loop (batch 1,
``test.py:134-150``), videos are batched as ``[V, K, T, H, W, C]`` uint8,
preprocessing (resize/normalize) runs on-device fused with the backbone, and
clips fold into the frame batch — a single jitted call scores ``V*K`` clips.
Multi-crop protocols (NvGesture 3/10-crop) fold crops into K.
"""

from __future__ import annotations

import functools
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from ehgr_tpu.eval.metrics import ConfusionMatrix, topk_correct
from ehgr_tpu.ops.preprocess_device import preprocess_eval_batch


def make_score_fn(model, variables, *, scale_size: int = 224,
                  crop_size: int = 224, square_resize: bool = True,
                  dtype_name: str = "bfloat16",
                  donate: bool = False) -> Callable:
    """Build a jitted ``frames_u8 [V,K,T,H,W,3] -> video_probs [V,C]`` fn."""

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def score(frames_u8: jnp.ndarray) -> jnp.ndarray:
        v, k, t = frames_u8.shape[:3]
        x = preprocess_eval_batch(
            frames_u8, scale_size=scale_size, crop_size=crop_size,
            square_resize=square_resize, dtype_name=dtype_name)
        x = x.reshape((v * k, t) + x.shape[3:])
        logits = model.apply(variables, x, train=False)  # [V*K, C]
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.mean(probs.reshape(v, k, -1), axis=1)  # clip voting

    return score


def make_sharded_score_fn(model, variables, mesh, *,
                          model_parallel: bool = False,
                          **score_kw) -> Callable:
    """Data-parallel multi-clip scorer over a device mesh.

    Videos shard over the mesh's ``data`` axis (eval is embarrassingly
    parallel — zero cross-device traffic in the common path); params
    replicate, or with ``model_parallel=True`` the classifier/exit head
    kernels shard their class dim over ``model`` (GSPMD all-gathers the
    tiny logit shards).  The video batch must be a multiple of the data
    axis size.  Same signature/semantics as ``make_score_fn`` otherwise —
    the eval-side counterpart of the sharded train step."""
    from ehgr_tpu.parallel.mesh import (DATA_AXIS, batch_sharding,
                                        param_shardings)

    variables = jax.device_put(
        variables, param_shardings(variables, mesh, model_parallel))
    score = make_score_fn(model, variables, **score_kw)
    sh = batch_sharding(mesh)
    ndata = mesh.shape[DATA_AXIS]

    def fn(frames_u8):
        v = frames_u8.shape[0]
        assert v % ndata == 0, \
            f"video batch {v} must divide data axis {ndata}"
        return score(jax.device_put(jnp.asarray(frames_u8), sh))

    return fn


def evaluate(score_fn: Callable, batches, num_classes: int,
             ks=(1, 5)) -> dict:
    """Run the protocol over an iterable of ``(frames_u8, labels)`` host
    batches; returns top-k accuracies + confusion matrix."""
    cm = ConfusionMatrix(num_classes)
    correct = {k: 0 for k in ks}
    total = 0
    for frames, labels in batches:
        probs = score_fn(jnp.asarray(frames))
        labels_j = jnp.asarray(labels)
        cs = topk_correct(probs, labels_j, ks)
        for k, c in zip(ks, cs):
            correct[k] += int(c)
        total += int(labels_j.shape[0])
        cm.update(np.asarray(jnp.argmax(probs, axis=-1)), np.asarray(labels))
    out = {f"top{k}": 100.0 * correct[k] / max(total, 1) for k in ks}
    out["confusion"] = cm
    out["n_videos"] = total
    return out
