"""Import shim for the reference torch code at /root/reference.

The full-model parity harness (tests/test_reference_parity.py) imports the
reference's own PyTorch modules and compares them numerically against our
Flax models under converted weights. The reference depends on fvcore and
torchvision, neither of which is installed here — this module installs
minimal, faithful stand-ins into ``sys.modules`` before the reference is
imported:

- ``fvcore.common.registry.Registry``: the tiny name→class registry surface
  the reference uses (register decorator + get).
- ``torchvision.models``: the standard torchvision ResNet architecture
  (BasicBlock / Bottleneck / ResNet with the canonical state_dict naming),
  which reference detectron2/layers/resnet_encoder.py:61-99 and
  BTSNet.py:278-333 construct encoders from. ``pretrained`` flags are
  ignored (no network egress; parity runs from seeded random weights).

Also patches ``torch.Tensor.cuda`` / ``torch.nn.Module.cuda`` to no-ops so
reference code with hard-coded ``.cuda()`` calls (BTSNet.py:142-145) runs on
CPU torch.
"""

from __future__ import annotations

import sys
import types


def _build_fvcore_stub():
    import torch.nn as nn  # noqa: F401  (parity with real fvcore import graph)

    class Registry:
        def __init__(self, name):
            self._name = name
            self._obj_map = {}

        def _do_register(self, name, obj):
            assert name not in self._obj_map, f"duplicate {name} in {self._name}"
            self._obj_map[name] = obj

        def register(self, obj=None):
            if obj is None:
                def deco(cls):
                    self._do_register(cls.__name__, cls)
                    return cls

                return deco
            self._do_register(obj.__name__, obj)
            return obj

        def get(self, name):
            ret = self._obj_map.get(name)
            if ret is None:
                raise KeyError(f"{name} not in {self._name} registry")
            return ret

        def __contains__(self, name):
            return name in self._obj_map

    fvcore = types.ModuleType("fvcore")
    fvcore.__version__ = "0.1.5"
    common = types.ModuleType("fvcore.common")
    registry_mod = types.ModuleType("fvcore.common.registry")
    registry_mod.Registry = Registry
    fvcore.common = common
    common.registry = registry_mod
    return {
        "fvcore": fvcore,
        "fvcore.common": common,
        "fvcore.common.registry": registry_mod,
    }


def _build_torchvision_stub():
    """The canonical torchvision ResNet (state_dict-compatible naming)."""
    import torch
    import torch.nn as nn

    def conv3x3(inp, out, stride=1, groups=1, dilation=1):
        return nn.Conv2d(
            inp, out, 3, stride=stride, padding=dilation, groups=groups,
            bias=False, dilation=dilation,
        )

    def conv1x1(inp, out, stride=1):
        return nn.Conv2d(inp, out, 1, stride=stride, bias=False)

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None, groups=1,
                     base_width=64, dilation=1, norm_layer=None):
            super().__init__()
            if norm_layer is None:
                norm_layer = nn.BatchNorm2d
            self.conv1 = conv3x3(inplanes, planes, stride)
            self.bn1 = norm_layer(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = conv3x3(planes, planes)
            self.bn2 = norm_layer(planes)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None, groups=1,
                     base_width=64, dilation=1, norm_layer=None):
            super().__init__()
            if norm_layer is None:
                norm_layer = nn.BatchNorm2d
            width = int(planes * (base_width / 64.0)) * groups
            self.conv1 = conv1x1(inplanes, width)
            self.bn1 = norm_layer(width)
            self.conv2 = conv3x3(width, width, stride, groups, dilation)
            self.bn2 = norm_layer(width)
            self.conv3 = conv1x1(width, planes * self.expansion)
            self.bn3 = norm_layer(planes * self.expansion)
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
        def __init__(self, block, layers, num_classes=1000, zero_init_residual=False,
                     groups=1, width_per_group=64, replace_stride_with_dilation=None,
                     norm_layer=None):
            super().__init__()
            if norm_layer is None:
                norm_layer = nn.BatchNorm2d
            self._norm_layer = norm_layer
            self.inplanes = 64
            self.dilation = 1
            self.groups = groups
            self.base_width = width_per_group
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = norm_layer(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
            self.layer1 = self._make_layer(block, 64, layers[0])
            self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
            self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
            self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(512 * block.expansion, num_classes)

        def _make_layer(self, block, planes, blocks, stride=1, dilate=False):
            norm_layer = self._norm_layer
            downsample = None
            previous_dilation = self.dilation
            if dilate:
                self.dilation *= stride
                stride = 1
            if stride != 1 or self.inplanes != planes * block.expansion:
                downsample = nn.Sequential(
                    conv1x1(self.inplanes, planes * block.expansion, stride),
                    norm_layer(planes * block.expansion),
                )
            layers = [
                block(self.inplanes, planes, stride, downsample, self.groups,
                      self.base_width, previous_dilation, norm_layer)
            ]
            self.inplanes = planes * block.expansion
            for _ in range(1, blocks):
                layers.append(
                    block(self.inplanes, planes, groups=self.groups,
                          base_width=self.base_width, dilation=self.dilation,
                          norm_layer=norm_layer)
                )
            return nn.Sequential(*layers)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = torch.flatten(self.avgpool(x), 1)
            return self.fc(x)

    def _factory(block, layers, **extra):
        def make(pretrained=False, progress=True, **kwargs):
            kwargs = {**extra, **kwargs}
            if kwargs.get("norm_layer") is None:
                kwargs.pop("norm_layer", None)
            return ResNet(block, layers, **kwargs)

        return make

    model_urls = {
        f"resnet{n}": f"stub://resnet{n}" for n in (18, 34, 50, 101, 152)
    }

    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    resnet_mod = types.ModuleType("torchvision.models.resnet")
    utils_mod = types.ModuleType("torchvision.models.utils")

    resnet_mod.BasicBlock = BasicBlock
    resnet_mod.Bottleneck = Bottleneck
    resnet_mod.ResNet = ResNet
    resnet_mod.conv1x1 = conv1x1
    resnet_mod.conv3x3 = conv3x3
    resnet_mod.model_urls = model_urls

    def load_state_dict_from_url(url, progress=True, **kw):
        raise RuntimeError(
            f"no network egress in the parity environment (requested {url}); "
            "parity tests run from seeded random weights"
        )

    utils_mod.load_state_dict_from_url = load_state_dict_from_url

    models.ResNet = ResNet
    models.resnet = resnet_mod
    models.utils = utils_mod
    models.resnet18 = _factory(BasicBlock, [2, 2, 2, 2])
    models.resnet34 = _factory(BasicBlock, [3, 4, 6, 3])
    models.resnet50 = _factory(Bottleneck, [3, 4, 6, 3])
    models.resnet101 = _factory(Bottleneck, [3, 4, 23, 3])
    models.resnet152 = _factory(Bottleneck, [3, 8, 36, 3])
    models.resnext50_32x4d = _factory(
        Bottleneck, [3, 4, 6, 3], groups=32, width_per_group=4
    )
    models.resnext101_32x8d = _factory(
        Bottleneck, [3, 4, 23, 3], groups=32, width_per_group=8
    )
    tv.models = models
    return {
        "torchvision": tv,
        "torchvision.models": models,
        "torchvision.models.resnet": resnet_mod,
        "torchvision.models.utils": utils_mod,
    }


_INSTALLED = False


def install_reference_environment(reference_root="/root/reference"):
    """Idempotently make ``import detectron2`` (the reference) work."""
    global _INSTALLED
    if _INSTALLED:
        return
    import torch

    for name, mod in {**_build_fvcore_stub(), **_build_torchvision_stub()}.items():
        sys.modules.setdefault(name, mod)

    # the reference hard-codes .cuda() in a few forward paths
    # (BTSNet.py:142-145); CPU torch must treat it as a no-op
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    # APPEND, never prepend: the repo's namespace packages (``projects``,
    # ``tools``) share names with the reference's; prepending made a later
    # ``from projects.MotionLearning.train import ...`` resolve to the
    # REFERENCE's train.py (which imports real fvcore) once any parity test
    # had run first in the same session.
    if reference_root not in sys.path:
        sys.path.append(reference_root)
    _INSTALLED = True


class RefCfg(dict):
    """Attribute-access dict standing in for the reference CfgNode
    (the reference models only read attributes / .get from cfg)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


def nested(d):
    return RefCfg({k: nested(v) if isinstance(v, dict) else v for k, v in d.items()})
