"""torch -> flax checkpoint conversion (parity gate, SURVEY.md §5).

Converts torchvision-ResNet / reference-TSN state_dicts (the
``{'state_dict': ...}`` payload of ``utils.py:24-36`` checkpoints) into this
framework's ``{'params', 'batch_stats'}`` variable tree so converted
reference checkpoints are logit-comparable.

The mapping is mechanical: each flax leaf path is rewritten to its torch key
by name rules, then the tensor is transposed by rank:

  conv2d  [O,I,kh,kw]      -> [kh,kw,I,O]   (also depthwise [C,1,kh,kw])
  conv3d  [O,I,kt,kh,kw]   -> [kt,kh,kw,I,O]
  conv1d  [O,I,k]          -> [k,I,O]
  linear  [O,I]            -> [I,O]
  1x1 conv used as Dense [O,I,1,1] -> [I,O]
  action_shift [C,1,3]     -> [3,C]

Name rules (flax -> torch): ``layer{i}_{j}`` -> ``layer{i}.{j}``;
``downsample_conv/bn`` -> ``downsample.0/1``; Action children ``pK_*`` ->
``action_pK_*``; ``shift_w`` -> ``action_shift.weight``; decoder
``conv{0..4}/bn{0..3}`` -> ``global_decoder.{seq idx}``; scala
``scala{k}/sep{i}/{dw1,pw1,bn1,dw2,pw2,bn2}`` -> ``scala{k}.{i}.op.{0,1,2,4,5,6}``;
BN leaves ``scale/bias/mean/var`` -> ``weight/bias/running_mean/running_var``.
"""

from __future__ import annotations

from typing import Any, Mapping, Tuple

import numpy as np

import jax.numpy as jnp
from flax.core import unfreeze
from flax.traverse_util import flatten_dict, unflatten_dict

_ACTION_CHILD = {
    "p1_conv": "action_p1_conv1",
    "p2_squeeze": "action_p2_squeeze",
    "p2_conv1": "action_p2_conv1",
    "p2_expand": "action_p2_expand",
    "p3_squeeze": "action_p3_squeeze",
    "p3_bn1": "action_p3_bn1",
    "p3_conv1": "action_p3_conv1",
    "p3_expand": "action_p3_expand",
    "net": "net",
}
_BN_LEAF = {"scale": "weight", "bias": "bias",
            "mean": "running_mean", "var": "running_var"}
# global decoder: nn.Sequential indices of convs/bns (models_MTMM.py:129-155)
# layout: [conv,bn,relu,up]x3 + [conv,bn,relu] + conv1x1 + sigmoid
_DECODER_SEQ = {"conv0": "0", "bn0": "1", "conv1": "4", "bn1": "5",
                "conv2": "8", "bn2": "9", "conv3": "12", "bn3": "13",
                "conv4": "15"}
# SepConv op indices (models_SD.py:84-97)
_SEPCONV_SEQ = {"dw1": "0", "pw1": "1", "bn1": "2", "dw2": "4", "pw2": "5",
                "bn2": "6"}
# BNInception branch names (archs/bn_inception.py Caffe-flat keys)
_BNI_BRANCH = {"b1x1": "1x1", "b3x3_reduce": "3x3_reduce", "b3x3": "3x3",
               "bd3x3_reduce": "double_3x3_reduce", "bd3x3_1": "double_3x3_1",
               "bd3x3_2": "double_3x3_2", "bpool_proj": "pool_proj"}
_BNI_STEM = {"conv1": "conv1_7x7_s2", "conv2_reduce": "conv2_3x3_reduce",
             "conv2": "conv2_3x3"}


def _flax_path_to_torch_key(path: Tuple[str, ...]) -> str:
    """Rewrite a flax variable path (collection stripped) to a torch key."""
    parts = list(path)
    leaf = parts.pop()
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        nxt = parts[i + 1] if i + 1 < len(parts) else None
        if p.startswith("inception_") and nxt in _BNI_BRANCH:
            # Caffe-flat BNInception keys: inception_3a_1x1[_bn].*
            layer = parts[i + 2]  # 'conv' | 'bn'
            out.append(f"{p}_{_BNI_BRANCH[nxt]}" +
                       ("_bn" if layer == "bn" else ""))
            i += 2
        elif p in _BNI_STEM and nxt in ("conv", "bn"):
            out.append(_BNI_STEM[p] + ("_bn" if nxt == "bn" else ""))
            i += 1
        elif p.startswith("features_"):
            # MobileNetV2: features.{i}[.conv].{j} (archs/mobilenet_v2.py)
            out.extend(["features", p[9:]])
        elif p.startswith("conv_") and "features" in out:
            out.extend(["conv", p[5:]])
        elif p in ("c0", "c1") and "features" in out:
            out.append(p[1:])
        elif p.startswith("layer") and "_" in p:
            stage, block = p[5:].split("_")
            out.extend([f"layer{stage}", block])
        elif p.split("_")[0] in ("convs", "bns") and "_" in p:
            # Res2Net width-slice ModuleLists (archs/res2net.py:50-51)
            base, idx = p.rsplit("_", 1)
            out.extend([base, idx])
        elif p == "downsample_conv":
            out.extend(["downsample", "0"])
        elif p == "downsample_bn":
            out.extend(["downsample", "1"])
        elif p in _ACTION_CHILD:
            out.append(_ACTION_CHILD[p])
        elif p in ("global_decoder", "local_decoder", "local_skel_decoder",
                   "global_skel_decoder"):
            out.append(p)
            nxt = parts[i + 1]
            if nxt.startswith("ctbn"):      # transposed style (MTMM+SD)
                out.append(str(2 * int(nxt[4:]) + 1))
            elif nxt.startswith("ct"):
                out.append(str(2 * int(nxt[2:])))
            else:                           # conv+upsample style (MTMM)
                out.append(_DECODER_SEQ[nxt])
            i += 1
        elif p == "text_encoder":
            out.append("text_encoder")
            out.append("0" if parts[i + 1] == "conv" else "1")
            i += 1
        elif p.startswith("scala"):
            out.append(p)  # scala1
            sep = parts[i + 1]               # sepK
            out.append(sep[3:])              # sequential index
            out.append("op")
            out.append(_SEPCONV_SEQ[parts[i + 2]])
            i += 2
        else:
            out.append(p)
        i += 1

    if leaf == "shift_w":
        out.append("action_shift")
        leaf_name = "weight"
    elif leaf == "kernel":
        leaf_name = "weight"
    elif leaf in _BN_LEAF and (out and ("bn" in out[-1] or
                                        out[-1] in ("1", "2", "5", "6", "9",
                                                    "13"))):
        leaf_name = _BN_LEAF[leaf]
    elif leaf in _BN_LEAF:
        leaf_name = _BN_LEAF[leaf]
    else:
        leaf_name = leaf  # bias
    return ".".join(out + [leaf_name])


def _convert_tensor(t: np.ndarray, flax_shape: Tuple[int, ...],
                    torch_key: str) -> np.ndarray:
    t = np.asarray(t)
    if torch_key.endswith("action_shift.weight"):
        return t[:, 0, :].T                    # [C,1,3] -> [3,C]
    if t.ndim == 4 and len(flax_shape) == 2:   # 1x1 conv used as Dense
        return t[:, :, 0, 0].T
    if t.ndim == 4:
        return t.transpose(2, 3, 1, 0)
    if t.ndim == 5:
        return t.transpose(2, 3, 4, 1, 0)
    if t.ndim == 3:
        return t.transpose(2, 1, 0)
    if t.ndim == 2:
        return t.T
    return t


def convert_state_dict(state_dict: Mapping[str, Any],
                       variables: Mapping[str, Any],
                       add_base_prefix: bool = False,
                       strict: bool = False):
    """Fill a flax variable tree from a torch state_dict.

    ``variables``: output of ``model.init`` — provides the target tree and
    shapes.  ``add_base_prefix=True`` maps a bare torchvision ResNet
    state_dict onto ``base_model/...`` (the common "load ImageNet weights"
    path, ``models_MTMM.py:109-127``).  Non-strict loading mirrors
    ``load_state_dict(strict=False)`` (``train_sd.py:644-647``): leaves
    without a torch source keep their init values (how SD absorbs MTMM
    weights while new branches stay fresh).

    Returns ``(new_variables, missing_keys)``.
    """
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        sd[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                           else v)

    flat = flatten_dict(unfreeze(variables))
    out = {}
    missing = []
    for path, leaf in flat.items():
        tpath = path[1:]  # strip collection ('params' / 'batch_stats')
        key = _flax_path_to_torch_key(tuple(tpath))
        if add_base_prefix and key.startswith("base_model."):
            key_try = key[len("base_model."):]
        else:
            key_try = key
        src = sd.get(key, sd.get(key_try))
        if src is None:
            missing.append(key)
            out[path] = leaf
            continue
        conv = _convert_tensor(src, tuple(np.shape(leaf)), key)
        if conv.shape != tuple(np.shape(leaf)):
            raise ValueError(
                f"shape mismatch for {key}: torch {conv.shape} vs flax "
                f"{np.shape(leaf)} at {path}")
        # Explicit copy: on the CPU backend ``jnp.asarray`` zero-copies
        # aligned contiguous numpy buffers, and non-transposed leaves
        # (biases, BN stats) are views into the LIVE torch tensors — a later
        # in-place ``optimizer.step()`` on the torch side would silently
        # mutate the converted jax params (found by the trajectory-parity
        # lockstep test).
        out[path] = jnp.asarray(np.array(conv, copy=True),
                                dtype=jnp.asarray(leaf).dtype)
    if strict and missing:
        raise KeyError(f"missing torch keys for: {missing[:10]} "
                       f"(+{max(0, len(missing) - 10)} more)")
    return unflatten_dict(out), missing


# --- flax -> torch EXPORT (the reverse direction) ---------------------------
#
# Every flax path already has a canonical torch key via
# ``_flax_path_to_torch_key`` (validated against the actual reference
# state_dicts by tests/test_reference_parity.py), so export is the exact
# inverse of the tensor rules above.  This makes checkpoints trained in
# this framework loadable by the REFERENCE scripts
# (``load_state_dict(strict=False)``, test.py:247-257) — the interop
# direction real users migrating off torch need for A/B validation.

# flax Dense leaves whose torch counterpart is a 1x1 Conv2d (the ACTION
# squeeze/expand sites, models/action.py:43-58)
_EXPORT_1X1_DENSE = ("action_p2_squeeze.weight", "action_p2_expand.weight",
                     "action_p3_expand.weight")


def _export_tensor(t: np.ndarray, torch_key: str) -> np.ndarray:
    t = np.asarray(t)
    if torch_key.endswith("action_shift.weight"):
        return np.ascontiguousarray(t.T[:, None, :])      # [3,C] -> [C,1,3]
    if t.ndim == 2 and torch_key.endswith(_EXPORT_1X1_DENSE):
        return np.ascontiguousarray(t.T[:, :, None, None])
    if t.ndim == 5:
        return np.ascontiguousarray(t.transpose(4, 3, 0, 1, 2))
    if t.ndim == 4:
        return np.ascontiguousarray(t.transpose(3, 2, 0, 1))
    if t.ndim == 3:
        return np.ascontiguousarray(t.transpose(2, 1, 0))
    if t.ndim == 2:
        return np.ascontiguousarray(t.T)
    return np.ascontiguousarray(t)


def export_state_dict(variables: Mapping[str, Any]) -> dict:
    """flax variables -> torch-layout state_dict (numpy arrays).

    Covers the resnet-family TSN surfaces (tsn / tsn_mtmm / tsn_sd /
    tsn_mtmm_sd and the Middle deploys share the same key space).  BN
    ``num_batches_tracked`` buffers are not emitted; the reference loads
    checkpoints with ``strict=False`` throughout, which tolerates that."""
    flat = flatten_dict(unfreeze(variables))
    sd = {}
    for path, leaf in flat.items():
        if path[0] not in ("params", "batch_stats"):
            continue                       # e.g. int8 'quant' scales
        key = _flax_path_to_torch_key(tuple(path[1:]))
        sd[key] = _export_tensor(np.asarray(leaf, np.float32), key)
    return sd


def save_torch_checkpoint(path: str, variables: Mapping[str, Any]) -> str:
    """Write a reference-compatible ``{'state_dict': ...}`` ``.pth.tar``
    (the ``utils.py:24-36`` payload shape) from flax variables."""
    import torch

    sd = {k: torch.from_numpy(np.array(v, copy=True)) for k, v in
          export_state_dict(variables).items()}
    torch.save({"state_dict": sd}, path)
    return path


def load_torch_checkpoint(path: str, variables: Mapping[str, Any],
                          strict: bool = False):
    """Load a reference ``*.pth.tar`` checkpoint ({'state_dict', 'optimizer'},
    ``utils.py:24-36``) or a bare state_dict file."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload.get("state_dict", payload) if isinstance(payload, dict) \
        else payload
    add_base = not any(k.startswith(("base_model.", "module.base_model."))
                       for k in sd)
    return convert_state_dict(sd, variables, add_base_prefix=add_base,
                              strict=strict)
