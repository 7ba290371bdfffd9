"""Minimal ``torchvision`` stand-in so the REFERENCE torch code is importable.

This environment has torch but not torchvision; the reference model files
(`/root/reference/models/models*.py`) need exactly four things from it:

* ``torchvision.models.resnet50/resnet101`` — the standard (v1.5, stride on
  conv2) Bottleneck ResNet with torchvision's module naming, so reference
  module surgery (``make_temporal_shift``) and state_dict keys line up;
* ``torchvision.models.ResNet`` — isinstance target of the surgery
  (``/root/reference/models/action.py:190``, ``temporal_shift.py:111``);
* ``torchvision.models.feature_extraction.create_feature_extractor`` — the
  MTMM feature-tap wrapper (``models_MTMM.py:70-77``); the shim version is a
  plain module that replays the ResNet forward collecting the requested
  nodes (sufficient because the reference only ever extracts from ResNets);
* ``torchvision.transforms`` (+ ``.functional``) — import-time references in
  ``spatial_transforms.py``; only ``Compose``/``CenterCrop``/``Resize``
  attributes need to exist for import.

Call :func:`install` before importing any reference module.  Weights are
always random — there is no download path here (tests convert the random
state_dict, they never need ImageNet weights).
"""

from __future__ import annotations

import sys
import types

import torch
from torch import nn


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNet(nn.Module):
    def __init__(self, layers, num_classes=1000):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0])
        self.layer2 = self._make_layer(128, layers[1], stride=2)
        self.layer3 = self._make_layer(256, layers[2], stride=2)
        self.layer4 = self._make_layer(512, layers[3], stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * 4, num_classes)
        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                nn.init.kaiming_normal_(m.weight, mode="fan_out",
                                        nonlinearity="relu")
            elif isinstance(m, nn.BatchNorm2d):
                nn.init.constant_(m.weight, 1)
                nn.init.constant_(m.bias, 0)

    def _make_layer(self, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                          bias=False),
                nn.BatchNorm2d(planes * 4))
        layers = [Bottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [Bottleneck(self.inplanes, planes)
                   for _ in range(1, blocks)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.avgpool(x)
        x = torch.flatten(x, 1)
        return self.fc(x)


def resnet50(pretrained=False, **kw):
    if pretrained:
        raise RuntimeError("torchvision shim has no pretrained weights "
                           "(no network egress); pass pretrain=''")
    return ResNet([3, 4, 6, 3], **kw)


def resnet101(pretrained=False, **kw):
    if pretrained:
        raise RuntimeError("torchvision shim has no pretrained weights "
                           "(no network egress); pass pretrain=''")
    return ResNet([3, 4, 23, 3], **kw)


class _FeatureExtractor(nn.Module):
    """Replays the (possibly surgered) ResNet forward, collecting nodes.

    The wrapped model is deliberately NOT registered as a submodule so the
    owning TSN's state_dict keeps only ``base_model.*`` keys (the real FX
    extractor shares parameter storage; key-set parity is what matters for
    the checkpoint converter)."""

    def __init__(self, model, return_nodes):
        super().__init__()
        object.__setattr__(self, "_wrapped", model)
        self.return_nodes = dict(return_nodes)

    def forward(self, x):
        m = self._wrapped
        taps = {}
        x = m.maxpool(m.relu(m.bn1(m.conv1(x))))
        taps["maxpool"] = x
        for k in ("layer1", "layer2", "layer3", "layer4"):
            x = getattr(m, k)(x)
            taps[k] = x
        x = m.avgpool(x)
        taps["avgpool"] = x
        x = torch.flatten(x, 1)
        taps["fc"] = m.fc(x)
        return {out: taps[node] for node, out in self.return_nodes.items()}


def create_feature_extractor(model, return_nodes):
    base = model
    assert isinstance(base, ResNet), (
        "shim create_feature_extractor supports the ResNet family only "
        f"(got {type(model).__name__})")
    return _FeatureExtractor(model, return_nodes)


def install() -> types.ModuleType:
    """Register the shim as ``torchvision`` in ``sys.modules`` (idempotent;
    a real torchvision, if ever present, wins)."""
    try:  # pragma: no cover - real torchvision not in this image
        import torchvision as tv  # noqa: F401
        return tv
    except ImportError:
        pass
    if "torchvision" in sys.modules:
        return sys.modules["torchvision"]

    tv = types.ModuleType("torchvision")
    models_mod = types.ModuleType("torchvision.models")
    models_mod.ResNet = ResNet
    models_mod.Bottleneck = Bottleneck
    models_mod.resnet50 = resnet50
    models_mod.resnet101 = resnet101
    fx_mod = types.ModuleType("torchvision.models.feature_extraction")
    fx_mod.create_feature_extractor = create_feature_extractor
    models_mod.feature_extraction = fx_mod

    transforms_mod = types.ModuleType("torchvision.transforms")

    class _Unavailable:
        def __init__(self, *a, **k):
            raise RuntimeError("torchvision shim: transforms are not "
                               "implemented (PIL pipeline lives in "
                               "ehgr_tpu.ops.spatial_transforms)")

    class Compose:
        def __init__(self, transforms):
            self.transforms = transforms

        def __call__(self, img):
            for t in self.transforms:
                img = t(img)
            return img

    transforms_mod.Compose = Compose
    transforms_mod.CenterCrop = _Unavailable
    transforms_mod.Resize = _Unavailable
    tf_mod = types.ModuleType("torchvision.transforms.functional")
    transforms_mod.functional = tf_mod

    tv.models = models_mod
    tv.transforms = transforms_mod
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models_mod
    sys.modules["torchvision.models.feature_extraction"] = fx_mod
    sys.modules["torchvision.transforms"] = transforms_mod
    sys.modules["torchvision.transforms.functional"] = tf_mod
    return tv
