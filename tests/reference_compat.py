"""Import shim for the reference torch code at /root/reference.

The full-model parity harness (tests/test_reference_parity.py) imports the
reference's own PyTorch modules and compares them numerically against our
Flax models under converted weights. The reference depends on fvcore and
torchvision, neither of which is installed here — this module installs
minimal, faithful stand-ins into ``sys.modules`` before the reference is
imported:

- ``fvcore.common.registry.Registry``: the tiny name→class registry surface
  the reference uses (register decorator + get).
- ``torchvision.models``: the standard torchvision ResNet / ResNeXt /
  DenseNet / MobileNetV2 architectures (canonical state_dict naming),
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

    # ---- DenseNet (canonical torchvision naming: features.conv0/norm0,
    # features.denseblock{i}.denselayer{j}.{norm1,conv1,norm2,conv2},
    # features.transition{i}.{norm,conv}, features.norm5) — reference
    # BTSNet.py:281-292 constructs densenet121/161 encoders from
    # ``models.densenetXXX(pretrained=True).features`` -------------------
    from collections import OrderedDict

    class _DenseLayer(nn.Module):
        def __init__(self, num_input_features, growth_rate, bn_size):
            super().__init__()
            self.norm1 = nn.BatchNorm2d(num_input_features)
            self.relu1 = nn.ReLU(inplace=True)
            self.conv1 = nn.Conv2d(
                num_input_features, bn_size * growth_rate, 1, stride=1, bias=False
            )
            self.norm2 = nn.BatchNorm2d(bn_size * growth_rate)
            self.relu2 = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(
                bn_size * growth_rate, growth_rate, 3, stride=1, padding=1, bias=False
            )

        def forward(self, x):
            out = self.conv1(self.relu1(self.norm1(x)))
            out = self.conv2(self.relu2(self.norm2(out)))
            return torch.cat([x, out], 1)

    class _DenseBlock(nn.Sequential):
        def __init__(self, num_layers, num_input_features, bn_size, growth_rate):
            super().__init__()
            for i in range(num_layers):
                self.add_module(
                    f"denselayer{i + 1}",
                    _DenseLayer(
                        num_input_features + i * growth_rate, growth_rate, bn_size
                    ),
                )

    class _Transition(nn.Sequential):
        def __init__(self, num_input_features, num_output_features):
            super().__init__()
            self.add_module("norm", nn.BatchNorm2d(num_input_features))
            self.add_module("relu", nn.ReLU(inplace=True))
            self.add_module(
                "conv",
                nn.Conv2d(num_input_features, num_output_features, 1, bias=False),
            )
            self.add_module("pool", nn.AvgPool2d(2, stride=2))

    class DenseNet(nn.Module):
        def __init__(self, growth_rate=32, block_config=(6, 12, 24, 16),
                     num_init_features=64, bn_size=4, num_classes=1000):
            super().__init__()
            self.features = nn.Sequential(OrderedDict([
                ("conv0", nn.Conv2d(3, num_init_features, 7, stride=2, padding=3,
                                    bias=False)),
                ("norm0", nn.BatchNorm2d(num_init_features)),
                ("relu0", nn.ReLU(inplace=True)),
                ("pool0", nn.MaxPool2d(3, stride=2, padding=1)),
            ]))
            num_features = num_init_features
            for i, num_layers in enumerate(block_config):
                self.features.add_module(
                    f"denseblock{i + 1}",
                    _DenseBlock(num_layers, num_features, bn_size, growth_rate),
                )
                num_features += num_layers * growth_rate
                if i != len(block_config) - 1:
                    self.features.add_module(
                        f"transition{i + 1}",
                        _Transition(num_features, num_features // 2),
                    )
                    num_features //= 2
            self.features.add_module("norm5", nn.BatchNorm2d(num_features))
            self.classifier = nn.Linear(num_features, num_classes)

        def forward(self, x):
            out = torch.relu(self.features(x))
            out = torch.flatten(nn.functional.adaptive_avg_pool2d(out, (1, 1)), 1)
            return self.classifier(out)

    def _densenet_factory(growth_rate, block_config, num_init_features):
        def make(pretrained=False, progress=True, **kwargs):
            return DenseNet(growth_rate, block_config, num_init_features, **kwargs)

        return make

    # ---- MobileNetV2 (canonical torchvision naming: features.0 ConvBNReLU
    # stem; features.1..17 InvertedResidual ``conv`` Sequential; features.18
    # ConvBNReLU head) — reference BTSNet.py:307-311 taps
    # ``models.mobilenet_v2(pretrained=True).features`` -------------------
    class ConvBNReLU(nn.Sequential):
        def __init__(self, in_planes, out_planes, kernel_size=3, stride=1, groups=1):
            padding = (kernel_size - 1) // 2
            super().__init__(
                nn.Conv2d(in_planes, out_planes, kernel_size, stride, padding,
                          groups=groups, bias=False),
                nn.BatchNorm2d(out_planes),
                nn.ReLU6(inplace=True),
            )

    class InvertedResidual(nn.Module):
        def __init__(self, inp, oup, stride, expand_ratio):
            super().__init__()
            self.stride = stride
            hidden_dim = int(round(inp * expand_ratio))
            self.use_res_connect = stride == 1 and inp == oup
            layers = []
            if expand_ratio != 1:
                layers.append(ConvBNReLU(inp, hidden_dim, kernel_size=1))
            layers.extend([
                ConvBNReLU(hidden_dim, hidden_dim, stride=stride, groups=hidden_dim),
                nn.Conv2d(hidden_dim, oup, 1, 1, 0, bias=False),
                nn.BatchNorm2d(oup),
            ])
            self.conv = nn.Sequential(*layers)

        def forward(self, x):
            return x + self.conv(x) if self.use_res_connect else self.conv(x)

    class MobileNetV2(nn.Module):
        def __init__(self, num_classes=1000):
            super().__init__()
            input_channel, last_channel = 32, 1280
            setting = [
                # t, c, n, s
                (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
                (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
            ]
            features = [ConvBNReLU(3, input_channel, stride=2)]
            for t, c, n, s in setting:
                for i in range(n):
                    features.append(
                        InvertedResidual(input_channel, c, s if i == 0 else 1,
                                         expand_ratio=t)
                    )
                    input_channel = c
            features.append(ConvBNReLU(input_channel, last_channel, kernel_size=1))
            self.features = nn.Sequential(*features)
            self.classifier = nn.Sequential(
                nn.Dropout(0.2), nn.Linear(last_channel, num_classes)
            )

        def forward(self, x):
            x = self.features(x)
            x = torch.flatten(nn.functional.adaptive_avg_pool2d(x, (1, 1)), 1)
            return self.classifier(x)

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
    models.DenseNet = DenseNet
    models.densenet121 = _densenet_factory(32, (6, 12, 24, 16), 64)
    models.densenet161 = _densenet_factory(48, (6, 12, 36, 24), 96)
    models.MobileNetV2 = MobileNetV2

    def mobilenet_v2(pretrained=False, progress=True, **kwargs):
        return MobileNetV2(**kwargs)

    models.mobilenet_v2 = mobilenet_v2
    tv.models = models
    return {
        "torchvision": tv,
        "torchvision.models": models,
        "torchvision.models.resnet": resnet_mod,
        "torchvision.models.utils": utils_mod,
    }


def _build_misc_stubs():
    """Import-satisfying stand-ins for the reference's small utility deps
    (none installed here): easydict (preprocess build), tabulate/termcolor
    (logger/evaluator formatting), iopath (PathManager).  Only the surface
    the reference's *eval chain* actually touches is implemented — the eval
    parity harness (tests/test_eval_parity.py) imports
    detectron2.evaluation.depth_evaluation, which pulls these in."""

    class EasyDict(dict):
        def __init__(self, d=None, **kwargs):
            super().__init__()
            d = dict(d or {}, **kwargs)
            for k, v in d.items():
                self[k] = v

        def __setitem__(self, k, v):
            if isinstance(v, dict) and not isinstance(v, EasyDict):
                v = EasyDict(v)
            elif isinstance(v, (list, tuple)):
                v = type(v)(EasyDict(x) if isinstance(x, dict) else x for x in v)
            super().__setitem__(k, v)
            super().__setattr__(k, v)

        __setattr__ = __setitem__

        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

    easydict = types.ModuleType("easydict")
    easydict.EasyDict = EasyDict

    tabulate_mod = types.ModuleType("tabulate")

    def tabulate(rows, headers=(), **kw):
        lines = ["\t".join(str(h) for h in headers)] if headers else []
        lines += ["\t".join(str(c) for c in row) for row in rows]
        return "\n".join(lines)

    tabulate_mod.tabulate = tabulate

    termcolor = types.ModuleType("termcolor")
    termcolor.colored = lambda text, *a, **k: text

    iopath = types.ModuleType("iopath")
    iopath_common = types.ModuleType("iopath.common")
    iopath_file_io = types.ModuleType("iopath.common.file_io")

    class PathHandler:
        pass

    class HTTPURLHandler(PathHandler):
        pass

    class OneDrivePathHandler(PathHandler):
        pass

    class PathManagerBase:
        def register_handler(self, *a, **k):
            pass

        def set_strict_kwargs_checking(self, *a, **k):
            pass

        def get_local_path(self, path, **k):
            return path

        def open(self, path, mode="r", **k):
            return open(path, mode)

        def exists(self, path, **k):
            import os

            return os.path.exists(path)

        def mkdirs(self, path, **k):
            import os

            os.makedirs(path, exist_ok=True)

    iopath_file_io.PathHandler = PathHandler
    iopath_file_io.HTTPURLHandler = HTTPURLHandler
    iopath_file_io.OneDrivePathHandler = OneDrivePathHandler
    iopath_file_io.PathManager = PathManagerBase
    iopath.common = iopath_common
    iopath_common.file_io = iopath_file_io

    return {
        "easydict": easydict,
        "tabulate": tabulate_mod,
        "termcolor": termcolor,
        "iopath": iopath,
        "iopath.common": iopath_common,
        "iopath.common.file_io": iopath_file_io,
    }


def _build_torchvision_transforms_stub(tv_modules):
    """torchvision.transforms surface used by the reference preprocess ops
    (formating.py ToTensor; augmentation.py RandomImageAug's ColorJitter +
    functional adjust_*).  ToTensor is implemented faithfully (HWC uint8 →
    CHW float/255); the jitter entry points raise if called — parity tests
    replay *captured* jittered batches, never the reference's jitter RNG."""
    import numpy as np
    import torch

    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")

    class ToTensor:
        def __call__(self, pic):
            arr = np.asarray(pic)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            t = torch.from_numpy(np.ascontiguousarray(arr.transpose(2, 0, 1)))
            if t.dtype == torch.uint8:
                t = t.float().div(255.0)
            return t

    class ColorJitter:
        def __init__(self, *a, **k):
            pass

        @staticmethod
        def get_params(*a, **k):
            raise NotImplementedError(
                "reference jitter RNG is not replicated; replay captured batches"
            )

        def __call__(self, img):
            raise NotImplementedError

    def _nope(*a, **k):
        raise NotImplementedError(
            "torchvision.transforms.functional stub: jitter is replayed from "
            "captured batches, not recomputed"
        )

    for name in (
        "adjust_brightness",
        "adjust_contrast",
        "adjust_saturation",
        "adjust_hue",
        "to_tensor",
        "resize",
        "hflip",
    ):
        setattr(functional, name, _nope)

    transforms.ToTensor = ToTensor
    transforms.ColorJitter = ColorJitter
    transforms.functional = functional
    tv_modules["torchvision"].transforms = transforms
    return {
        "torchvision.transforms": transforms,
        "torchvision.transforms.functional": functional,
    }


_INSTALLED = False


def install_reference_environment(reference_root="/root/reference"):
    """Idempotently make ``import detectron2`` (the reference) work."""
    global _INSTALLED
    if _INSTALLED:
        return
    import torch

    tv_modules = _build_torchvision_stub()
    modules = {
        **_build_fvcore_stub(),
        **tv_modules,
        **_build_torchvision_transforms_stub(tv_modules),
        **_build_misc_stubs(),
    }
    import importlib.machinery

    for name, mod in modules.items():
        if getattr(mod, "__spec__", None) is None:
            # importlib.util.find_spec raises on in-sys.modules modules with
            # __spec__ None (pandas probes optional deps like tabulate)
            mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
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
