"""ctypes bindings + geometry planner for the native clip decoder.

``native/ehgr_io.cpp`` fuses decode -> PIL-parity resize -> crop(s) ->
resize -> flip per frame, multithreaded, writing straight into a
preallocated uint8 array.  This module:

* builds the shared library on demand (g++, cached by source mtime) —
  no pybind11 in this image, so the binding is plain ctypes;
* plans clip geometry by walking the SAME transform objects the PIL path
  uses (``ehgr_tpu/ops/spatial_transforms.py``) and consuming the SAME rng
  streams, so a dataset seeded identically produces identical crops through
  either backend;
* exposes ``decode_clip(paths, transform, mode)`` — the drop-in fast path
  for ``datasets._decode`` (wired by ``DataConfig.backend='native'``).

Reference anchor: the reference feeds PIL lists through torch's native
DataLoader machinery (``data/dataset_EgoGesture.py:141-`` +
``train_mtmm.py:379-396``); this is the TPU-native equivalent of that
native input path.  Unsupported chains (flow inversion, exotic composes)
raise ``UnsupportedChain`` and callers fall back to PIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ehgr_tpu.ops import spatial_transforms as st

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "ehgr_io.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LIB_ERR: Optional[str] = None


class UnsupportedChain(Exception):
    """Transform chain the native planner does not cover (caller falls
    back to the PIL path)."""


def _build_lib() -> str:
    """Compile (or reuse) the shared library; returns its path."""
    out_dir = os.path.join(_REPO, "native", "build")
    os.makedirs(out_dir, exist_ok=True)
    so = os.path.join(out_dir, "libehgr_io.so")
    if (os.path.exists(so)
            and os.path.getmtime(so) >= os.path.getmtime(_SRC)):
        return so
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
           _SRC, "-o", so, "-ljpeg", "-lpng"]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return so


def _get_lib() -> ctypes.CDLL:
    global _LIB, _LIB_ERR
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if _LIB_ERR is not None:
            raise RuntimeError(_LIB_ERR)
        try:
            lib = ctypes.CDLL(_build_lib())
        except (OSError, subprocess.CalledProcessError) as e:
            _LIB_ERR = f"native io unavailable: {e}"
            raise RuntimeError(_LIB_ERR) from e
        lib.ehgr_image_size.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.ehgr_image_size.restype = ctypes.c_int
        lib.ehgr_decode_clip.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int]
        lib.ehgr_decode_clip.restype = ctypes.c_int
        lib.ehgr_decode_image.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte)]
        lib.ehgr_decode_image.restype = ctypes.c_int
        _LIB = lib
        return lib


def available() -> bool:
    """True when the toolchain/libs exist and the library builds."""
    try:
        _get_lib()
        return True
    except RuntimeError:
        return False


def image_size(path: str) -> Tuple[int, int]:
    """(w, h) from the header only."""
    lib = _get_lib()
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.ehgr_image_size(path.encode(), ctypes.byref(w),
                           ctypes.byref(h)) != 0:
        raise IOError(f"cannot read image header: {path}")
    return w.value, h.value


def decode_image(path: str, size: Optional[Tuple[int, int]] = None,
                 gray: bool = False) -> np.ndarray:
    """Decode one image (optionally resized to ``(w, h)``) -> uint8 HWC."""
    lib = _get_lib()
    if size is None:
        w, h = image_size(path)
    else:
        w, h = size
    c = 1 if gray else 3
    out = np.empty((h, w, c), np.uint8)
    rc = lib.ehgr_decode_image(
        path.encode(), 0 if size is None else w, 0 if size is None else h,
        c, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    if rc != 0:
        raise IOError(f"native decode failed ({rc}): {path}")
    return out


# ---------------------------------------------------------------------------
# geometry planning: transform chain -> (scale, rects, flips, out size)
# ---------------------------------------------------------------------------

def _scale_target(size, im_w: int, im_h: int) -> Tuple[int, int]:
    """GroupScale semantics: int = short-side, [w, h] = exact."""
    import numbers
    if isinstance(size, numbers.Number):
        short = int(size)
        if min(im_w, im_h) == short:
            return im_w, im_h
        if im_w < im_h:
            return short, int(round(short * im_h / im_w))
        return int(round(short * im_w / im_h)), short
    return int(size[0]), int(size[1])


def plan_clip(transform, im_w: int, im_h: int, mode: str = "RGB"):
    """Resolve a transform chain into native-decoder geometry.

    Consumes the chain's rng streams exactly as its PIL ``__call__`` would,
    so seeded runs match across backends.  Returns
    ``(sw, sh, rects [K,4], flips [K], out_w, out_h)``.
    """
    chain = (list(transform.transforms) if isinstance(transform, st.Compose)
             else [transform])
    sw, sh = 0, 0
    cur_w, cur_h = im_w, im_h
    rects: List[Tuple[int, int, int, int]] = []
    flips: List[int] = []
    out_w = out_h = None

    i = 0
    while i < len(chain):
        t = chain[i]
        if isinstance(t, st.IdentityTransform):
            pass
        elif isinstance(t, st.GroupScale):
            if rects:
                raise UnsupportedChain("scale after crop")
            sw, sh = _scale_target(t.size, im_w, im_h)
            cur_w, cur_h = sw, sh
        elif isinstance(t, st.GroupCenterCrop):
            th, tw = t.size
            x1 = int(round((cur_w - tw) / 2.0))
            y1 = int(round((cur_h - th) / 2.0))
            rects, flips = [(x1, y1, tw, th)], [0]
            out_w, out_h = tw, th
        elif isinstance(t, st.GroupRandomCrop):
            th, tw = t.size
            x1 = int(t.rng.integers(0, cur_w - tw + 1))
            y1 = int(t.rng.integers(0, cur_h - th + 1))
            rects, flips = [(x1, y1, tw, th)], [0]
            out_w, out_h = tw, th
        elif isinstance(t, st.GroupMultiScaleCrop):
            cw, ch, ox, oy = t._sample_crop_size((cur_w, cur_h))
            rects, flips = [(ox, oy, cw, ch)], [0]
            out_w, out_h = t.input_size
        elif isinstance(t, st.GroupRandomHorizontalFlip):
            if t.is_flow:
                raise UnsupportedChain("flow flip inversion")
            if not rects:
                rects, flips = [(0, 0, cur_w, cur_h)], [0]
                out_w, out_h = cur_w, cur_h
            if t.rng.random() < 0.5:
                flips = [1] * len(flips)
        elif isinstance(t, (st.GroupFullResSample, st.GroupOverSample)):
            if rects or i != len(chain) - 1:
                raise UnsupportedChain("multi-crop must terminate the chain")
            if t.scale_worker is not None:
                sw, sh = _scale_target(t.scale_worker.size, im_w, im_h)
                cur_w, cur_h = sw, sh
            ch, cw = t.crop_size
            if isinstance(t, st.GroupFullResSample):
                ws = (cur_w - cw) // 4
                hs = (cur_h - ch) // 4
                offsets = [(0, 2 * hs), (4 * ws, 2 * hs), (2 * ws, 2 * hs)]
            else:
                offsets = st.fill_fix_offset(False, cur_w, cur_h, cw, ch)
            if t.flip and mode == "L":
                # PIL GroupOverSample/GroupFullResSample invert flipped
                # grayscale crops at even frame indices (ImageOps.invert,
                # the torchvision Flow convention) — the native path emits
                # plain flips, which would break the bit-exact contract
                # (ADVICE r2 #2; dormant: the factory builds flip=False)
                raise UnsupportedChain("flip+L multi-crop (Flow inversion)")
            for ox, oy in offsets:
                rects.append((ox, oy, cw, ch))
                flips.append(0)
                if t.flip:
                    rects.append((ox, oy, cw, ch))
                    flips.append(1)
            out_w, out_h = cw, ch
        else:
            raise UnsupportedChain(type(t).__name__)
        i += 1

    if not rects:                    # scale-only chain (EgoGesture eval)
        rects, flips = [(0, 0, cur_w, cur_h)], [0]
        out_w, out_h = cur_w, cur_h
    return sw, sh, rects, flips, out_w, out_h


def decode_clip(paths: Sequence[str], indices: np.ndarray, mode: str,
                transform, n_threads: int = 0,
                fast: bool = False) -> np.ndarray:
    """Native equivalent of ``datasets._decode``: decode the selected
    frames through the planned chain -> uint8 ``[K*T', H, W, C]`` with the
    PIL multi-crop frame order (all T per crop, crops concatenated).

    ``fast=True`` allows DCT-scaled JPEG decode when a resize follows —
    ~2-4x less IDCT+resample work on downscale at the cost of bit-parity
    with PIL (same geometry; interpolation source is the 1/2^k decode).

    Raises ``UnsupportedChain`` / ``IOError`` for the PIL fallback.
    """
    lib = _get_lib()
    sel = [paths[int(i)] for i in np.asarray(indices).reshape(-1)]
    im_w, im_h = image_size(sel[0])
    sw, sh, rects, flips, ow, oh = plan_clip(
        transform if transform is not None else st.IdentityTransform(),
        im_w, im_h, mode=mode)
    k, t = len(rects), len(sel)
    c = 1 if mode == "L" else 3
    out = np.empty((k, t, oh, ow, c), np.uint8)
    c_paths = (ctypes.c_char_p * t)(*[p.encode() for p in sel])
    c_rects = (ctypes.c_int * (k * 4))(
        *[v for r in rects for v in r])
    c_flips = (ctypes.c_int * k)(*flips)
    rc = lib.ehgr_decode_clip(
        c_paths, t, im_w, im_h, sw, sh, c_rects, c_flips, k, ow, oh, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), n_threads,
        int(fast))
    if rc != 0:
        raise IOError(f"native clip decode failed (rc={rc}, first={sel[0]})")
    return out.reshape(k * t, oh, ow, c)
