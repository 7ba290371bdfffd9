"""AOT serving export — self-contained StableHLO artifacts for deployment.

New TPU-first component (the reference "deploys" by re-importing its Python
model code and unpickling a torch checkpoint, ``test.py:247-257``).  Here the
FULL jitted scoring program — on-device uint8 preprocess + backbone + softmax
clip vote — is captured with ``jax.export``, weights baked in as constants,
and serialized into one file a serving process reloads **without any model
code**:

    fn, manifest = load_artifact("tsn_middle2.ehgrx")
    probs = fn(frames_u8)          # [V, K, T, H, W, 3] u8 -> [V, C]

An optional symbolic batch dimension (``symbolic_batch``) lets a single
artifact serve any request batch size.  Artifacts can be lowered for
platforms the exporting host does not have (e.g. export for TPU from a CPU
build box) via ``platforms=("tpu",)``.

File format (``.ehgrx``): ``EHGRX1\\n`` magic, u32-LE header length, JSON
manifest (arch/geometry/platforms/jax version), then the ``jax.export``
blob.
"""

from __future__ import annotations

import json
import struct
from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jexport

from ehgr_tpu.ops.preprocess_device import normalize_clip, preprocess_eval_batch

_MAGIC = b"EHGRX1\n"


def make_clip_scorer(model, variables, *, mean, std,
                     dtype_name: str = "bfloat16",
                     return_probs: bool = True) -> Callable:
    """Jitted ``clips_u8 [N,T,H,W,3] -> [N,C]`` with weights closed over.

    Pre-cropped clips (the ``tsn_middleK`` deploy contract); multi-output
    variants (SD/MTMM) reduce to their primary logits."""

    @jax.jit
    def score(clips_u8: jnp.ndarray) -> jnp.ndarray:
        x = normalize_clip(clips_u8, mean, std, dtype=jnp.dtype(dtype_name))
        out = model.apply(variables, x, train=False)
        logits = out[0] if isinstance(out, tuple) else out
        return jax.nn.softmax(logits, -1) if return_probs else logits

    return score


def make_video_scorer(model, variables, *, scale_size: int = 224,
                      crop_size: int = 224, square_resize: bool = True,
                      dtype_name: str = "bfloat16") -> Callable:
    """Jitted full protocol ``frames_u8 [V,K,T,H,W,3] -> video probs [V,C]``
    (resize/crop/normalize on device + softmax-mean clip vote; the
    ``eval.inference.make_score_fn`` program, export-shaped)."""

    @jax.jit
    def score(frames_u8: jnp.ndarray) -> jnp.ndarray:
        v, k, t = frames_u8.shape[:3]
        x = preprocess_eval_batch(
            frames_u8, scale_size=scale_size, crop_size=crop_size,
            square_resize=square_resize, dtype_name=dtype_name)
        x = x.reshape((v * k, t) + x.shape[3:])
        out = model.apply(variables, x, train=False)
        logits = out[0] if isinstance(out, tuple) else out
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.mean(probs.reshape(v, k, -1), axis=1)

    return score


def symbolic_batch(shape: Sequence[int], name: str = "v"):
    """Replace the leading dim of ``shape`` with a symbolic dimension so the
    exported artifact accepts any batch size at that position."""
    (dim,) = jexport.symbolic_shape(name)
    return (dim,) + tuple(shape[1:])


def export_artifact(fn: Callable, arg_shape, *, dtype=jnp.uint8,
                    platforms: Sequence[str] | None = None
                    ) -> jexport.Exported:
    """Export a jitted scorer taking one array of ``arg_shape`` (static ints
    or a ``symbolic_batch`` result)."""
    spec = jax.ShapeDtypeStruct(tuple(arg_shape), dtype)
    kw = {"platforms": tuple(platforms)} if platforms else {}
    return jexport.export(fn, **kw)(spec)


def save_artifact(path: str, exported: jexport.Exported,
                  manifest: Dict) -> int:
    """Write magic + JSON manifest + serialized program; returns bytes."""
    manifest = dict(manifest)
    manifest.setdefault("jax_version", jax.__version__)
    manifest.setdefault("platforms", list(exported.platforms))
    manifest.setdefault("in_shape", [str(d) for d in
                                     exported.in_avals[0].shape])
    header = json.dumps(manifest).encode()
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        f.write(blob)
    return len(_MAGIC) + 4 + len(header) + len(blob)


def load_artifact(path: str) -> Tuple[Callable, Dict]:
    """Reload ``(jitted fn, manifest)`` from a ``save_artifact`` file —
    no model code or weights needed."""
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not an EHGRX1 artifact")
        (hlen,) = struct.unpack("<I", f.read(4))
        manifest = json.loads(f.read(hlen).decode())
        blob = f.read()
    exported = jexport.deserialize(blob)
    return jax.jit(exported.call), manifest
