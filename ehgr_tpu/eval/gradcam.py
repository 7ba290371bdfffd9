"""GradCAM for TSN models (ref ``cam_visualize.py:60-100``: GradCAM over
``base_model.layer4[-1]`` via pytorch_grad_cam).

JAX formulation: pull the layer4 tap out of a single forward
(``TSN(..., return_taps=True)``), then differentiate the *head* — a pure
function of the tap — with ``jax.vjp``.  For the final head that VJP is the
classifier row spread over pooling, for middle exits it flows through the
scala branch; both come out of the same code path.

CAM = ReLU( sum_c ( mean_hw(dlogit/dA)_c * A_c ) ), per frame, normalized.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ehgr_tpu.models.decoders import Scala
from ehgr_tpu.models.tsn import _SCALA_WIDTHS
from ehgr_tpu.ops.consensus import consensus


def _final_head_fn(model, variables):
    """layer4 tap -> [N, num_class] logits (pool + new_fc + consensus)."""
    w = variables["params"]["new_fc"]["kernel"]
    b = variables["params"]["new_fc"]["bias"]

    def head(acts):                       # [NT, h, w, C]
        pooled = jnp.mean(acts, axis=(1, 2))
        logits = pooled @ w + b
        return consensus(
            logits.reshape(-1, model.num_segments, logits.shape[-1]))

    return head, "layer4"


def _mid_head_fn(model, variables, k: int):
    """layerK tap -> exit-K logits (scalaK + middle_fcK + consensus)."""
    scala = Scala(_SCALA_WIDTHS[k], name=f"scala{k}")
    sub = {"params": variables["params"][f"scala{k}"],
           "batch_stats": variables["batch_stats"][f"scala{k}"]}
    w = variables["params"][f"middle_fc{k}"]["kernel"]
    b = variables["params"][f"middle_fc{k}"]["bias"]

    def head(acts):
        h = scala.apply(sub, acts, train=False)
        pooled = jnp.mean(h, axis=(1, 2))
        logits = pooled @ w + b
        return consensus(
            logits.reshape(-1, model.num_segments, logits.shape[-1]))

    return head, f"layer{k}"


def gradcam(model, variables, clip: jnp.ndarray,
            class_idx: Optional[int] = None,
            exit: str = "final") -> Tuple[np.ndarray, np.ndarray]:
    """Compute per-frame CAMs for a normalized clip ``[N, T, H, W, 3]``.

    Returns ``(cams [N*T, h, w] in [0,1], logits [N, C])``."""
    out, taps = model.apply(variables, clip, train=False, return_taps=True)
    if exit == "final":
        head, tap_name = _final_head_fn(model, variables)
    else:
        head, tap_name = _mid_head_fn(model, variables, int(exit[-1]))
    acts = taps[tap_name]

    logits, vjp_fn = jax.vjp(head, acts)
    if class_idx is None:
        class_idx = int(jnp.argmax(logits[0]))
    seed = jnp.zeros_like(logits).at[:, class_idx].set(1.0)
    (grads,) = vjp_fn(seed)                       # [NT, h, w, C]

    weights = jnp.mean(grads, axis=(1, 2), keepdims=True)
    cam = jax.nn.relu(jnp.sum(weights * acts, axis=-1))   # [NT, h, w]
    lo = cam.min(axis=(1, 2), keepdims=True)
    hi = cam.max(axis=(1, 2), keepdims=True)
    cam = (cam - lo) / jnp.maximum(hi - lo, 1e-8)
    return np.asarray(cam), np.asarray(logits)


def overlay_cam(frame_u8: np.ndarray, cam: np.ndarray,
                alpha: float = 0.5) -> np.ndarray:
    """Blend a CAM heatmap (red channel ramp) over an RGB uint8 frame."""
    from PIL import Image

    h, w = frame_u8.shape[:2]
    cam_img = np.asarray(Image.fromarray(
        (cam * 255).astype(np.uint8)).resize((w, h), Image.BILINEAR))
    heat = np.zeros_like(frame_u8)
    heat[..., 0] = cam_img                       # red ramp
    heat[..., 2] = 255 - cam_img                 # blue for cold
    return ((1 - alpha) * frame_u8 + alpha * heat).astype(np.uint8)
