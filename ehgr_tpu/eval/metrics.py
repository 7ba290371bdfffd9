"""Accuracy / confusion-matrix metrics.

References: top-k accuracy ``utils.py:7-21``; confusion matrix + per-class
accuracy ``test.py:288-315``.  Device-side pieces are pure jnp (jit/shard
friendly); confusion matrices accumulate on host in numpy."""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

import jax.numpy as jnp


def topk_correct(logits: jnp.ndarray, labels: jnp.ndarray,
                 ks: Sequence[int] = (1, 5)) -> Tuple[jnp.ndarray, ...]:
    """Number of top-k-correct rows for each k (device-side)."""
    maxk = max(ks)
    # top-maxk indices, descending
    topi = jnp.argsort(-logits, axis=-1)[:, :maxk]
    hit = (topi == labels[:, None])
    return tuple(jnp.sum(jnp.any(hit[:, :k], axis=1)) for k in ks)


def topk_accuracy(logits, labels, ks=(1, 5)):
    """Percent top-k accuracy (the reference's ``accuracy``)."""
    n = labels.shape[0]
    return tuple(100.0 * c / n for c in topk_correct(logits, labels, ks))


class ConfusionMatrix:
    """Streaming confusion matrix + per-class accuracy (host side)."""

    def __init__(self, num_classes: int):
        self.m = np.zeros((num_classes, num_classes), dtype=np.int64)

    def update(self, preds: np.ndarray, labels: np.ndarray):
        preds = np.asarray(preds).reshape(-1)
        labels = np.asarray(labels).reshape(-1)
        np.add.at(self.m, (labels, preds), 1)

    @property
    def per_class_accuracy(self) -> np.ndarray:
        denom = self.m.sum(axis=1)
        return np.divide(np.diag(self.m), denom,
                         out=np.zeros_like(denom, dtype=np.float64),
                         where=denom > 0)

    @property
    def normalized(self) -> np.ndarray:
        denom = self.m.sum(axis=1, keepdims=True)
        return np.divide(self.m, denom, out=np.zeros_like(self.m, np.float64),
                         where=denom > 0)

    def save_heatmap(self, path: str, class_names=None):
        """Dump the normalized matrix as a PNG heatmap (matplotlib-free:
        PIL grayscale), mirroring the reference's seaborn artifact
        (test.py:288-315) without the plotting dependency."""
        from PIL import Image

        m = (self.normalized * 255).astype(np.uint8)
        scale = max(1, 512 // max(1, m.shape[0]))
        img = Image.fromarray(m, mode="L").resize(
            (m.shape[1] * scale, m.shape[0] * scale), Image.NEAREST)
        img.save(path)
