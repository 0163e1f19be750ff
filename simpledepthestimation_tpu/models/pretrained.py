"""ImageNet-pretrained encoder loading.

The reference pulls torchvision ImageNet weights at construction time
(reference detectron2/layers/resnet_encoder.py:82-86 — the ``pt`` encoder
suffix). This module is the TPU-side equivalent: a one-time converter from a
torchvision ResNet ``state_dict`` (a local ``.pth`` file; this environment
has no network egress) into our Flax parameter tree, plus an injection
helper used after ``model.init``.

Torch OIHW conv kernels transpose to flax HWIO; BatchNorm weight/bias →
scale/bias, running stats → batch_stats.

Set the weight file via cfg ``MODEL.DEPTH_NET.PRETRAINED_WEIGHTS`` or the
``SDE_TPU_PRETRAINED_DIR`` env var (expects ``resnet{N}.pth``); absent
weights degrade to random init with a warning (training still works, the
ImageNet warm start is lost).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def _t2f(name_w: np.ndarray) -> np.ndarray:
    """torch conv OIHW → flax HWIO."""
    return np.transpose(name_w, (2, 3, 1, 0))


def convert_torch_resnet(state_dict: Dict[str, "np.ndarray"], num_layers: int):
    """Convert a torchvision ResNet state_dict into (params, batch_stats)
    trees matching ``simpledepthestimation_tpu.models.resnet.ResNetEncoder``.

    state_dict values may be torch tensors or numpy arrays.
    """

    def arr(key):
        v = state_dict[key]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    params: Dict = {}
    stats: Dict = {}

    def put_conv(flax_name, torch_name):
        params[flax_name] = {"kernel": _t2f(arr(f"{torch_name}.weight"))}

    def put_bn(flax_name, torch_name):
        params[flax_name] = {
            "scale": arr(f"{torch_name}.weight"),
            "bias": arr(f"{torch_name}.bias"),
        }
        stats[flax_name] = {
            "mean": arr(f"{torch_name}.running_mean"),
            "var": arr(f"{torch_name}.running_var"),
        }

    put_conv("conv1", "conv1")
    put_bn("bn1", "bn1")

    from .resnet import BLOCKS, BOTTLENECK

    blocks = BLOCKS[num_layers]
    bottleneck = BOTTLENECK[num_layers]
    n_convs = 3 if bottleneck else 2

    for layer_idx, n_blocks in enumerate(blocks, start=1):
        for b in range(n_blocks):
            tprefix = f"layer{layer_idx}.{b}"
            fname = f"layer{layer_idx}_{b}"
            block_params: Dict = {}
            block_stats: Dict = {}
            for c in range(1, n_convs + 1):
                block_params[f"conv{c}"] = {
                    "kernel": _t2f(arr(f"{tprefix}.conv{c}.weight"))
                }
                block_params[f"bn{c}"] = {
                    "scale": arr(f"{tprefix}.bn{c}.weight"),
                    "bias": arr(f"{tprefix}.bn{c}.bias"),
                }
                block_stats[f"bn{c}"] = {
                    "mean": arr(f"{tprefix}.bn{c}.running_mean"),
                    "var": arr(f"{tprefix}.bn{c}.running_var"),
                }
            if f"{tprefix}.downsample.0.weight" in state_dict:
                block_params["downsample_conv"] = {
                    "kernel": _t2f(arr(f"{tprefix}.downsample.0.weight"))
                }
                block_params["downsample_bn"] = {
                    "scale": arr(f"{tprefix}.downsample.1.weight"),
                    "bias": arr(f"{tprefix}.downsample.1.bias"),
                }
                block_stats["downsample_bn"] = {
                    "mean": arr(f"{tprefix}.downsample.1.running_mean"),
                    "var": arr(f"{tprefix}.downsample.1.running_var"),
                }
            params[fname] = block_params
            stats[fname] = block_stats

    return params, stats


def convert_torch_resnet_convs_only(state_dict, num_layers: int):
    """Conv-kernel-only conversion for encoders with non-BN norms
    (GoogleResNet with RandLayerNorm — the reference loads torchvision
    weights with strict=False, GoogleResNet.py:38-53: conv weights land,
    norm params keep their init). Returns a params tree matching
    ``models.google_resnet.NormResNetEncoder`` naming."""

    def arr(key):
        v = state_dict[key]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    from .resnet import BLOCKS, BOTTLENECK

    params: Dict = {"conv1": {"kernel": _t2f(arr("conv1.weight"))}}
    n_convs = 3 if BOTTLENECK[num_layers] else 2
    for layer_idx, n_blocks in enumerate(BLOCKS[num_layers], start=1):
        for b in range(n_blocks):
            tprefix = f"layer{layer_idx}.{b}"
            block: Dict = {}
            for c in range(1, n_convs + 1):
                block[f"conv{c}"] = {"kernel": _t2f(arr(f"{tprefix}.conv{c}.weight"))}
            if f"{tprefix}.downsample.0.weight" in state_dict:
                block["down_conv"] = {
                    "kernel": _t2f(arr(f"{tprefix}.downsample.0.weight"))
                }
            params[f"layer{layer_idx}_{b}"] = block
    return params


def find_pretrained_file(num_layers: int, explicit: str = "", filename: str = "") -> Optional[str]:
    """Resolve the weight file: explicit path wins; else
    $SDE_TPU_PRETRAINED_DIR/{filename or resnet{num_layers}}.pth."""
    if explicit and os.path.isfile(explicit):
        return explicit
    base = os.environ.get("SDE_TPU_PRETRAINED_DIR", "")
    if base:
        name = filename or f"resnet{num_layers}"
        cand = os.path.join(base, f"{name}.pth")
        if os.path.isfile(cand):
            return cand
    return None


def convert_torch_densenet(state_dict, block_config: Tuple[int, ...]):
    """Convert a torchvision DenseNet ``state_dict`` (reference
    BTSNet.py:281-292 loads densenet121/161 via torchvision) into
    (params, batch_stats) trees matching ``encoders.DenseNetEncoder``.

    torchvision layout: ``features.conv0/norm0``,
    ``features.denseblock{i}.denselayer{j}.{norm1,conv1,norm2,conv2}``
    (1-based i/j), ``features.transition{i}.{norm,conv}``, ``features.norm5``.
    """

    def arr(key):
        v = state_dict[key]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    def bn(torch_name):
        p = {"scale": arr(f"{torch_name}.weight"), "bias": arr(f"{torch_name}.bias")}
        s = {
            "mean": arr(f"{torch_name}.running_mean"),
            "var": arr(f"{torch_name}.running_var"),
        }
        return p, s

    params: Dict = {"conv0": {"kernel": _t2f(arr("features.conv0.weight"))}}
    stats: Dict = {}
    params["norm0"], stats["norm0"] = bn("features.norm0")

    for i, n_layers in enumerate(block_config, start=1):
        for j in range(1, n_layers + 1):
            t = f"features.denseblock{i}.denselayer{j}"
            f = f"dense{i}_{j - 1}"
            n1p, n1s = bn(f"{t}.norm1")
            n2p, n2s = bn(f"{t}.norm2")
            params[f] = {
                "norm1": n1p,
                "conv1": {"kernel": _t2f(arr(f"{t}.conv1.weight"))},
                "norm2": n2p,
                "conv2": {"kernel": _t2f(arr(f"{t}.conv2.weight"))},
            }
            stats[f] = {"norm1": n1s, "norm2": n2s}
        if i != len(block_config):
            t = f"features.transition{i}"
            params[f"trans{i}_norm"], stats[f"trans{i}_norm"] = bn(f"{t}.norm")
            params[f"trans{i}_conv"] = {"kernel": _t2f(arr(f"{t}.conv.weight"))}
    params["norm5"], stats["norm5"] = bn("features.norm5")
    return params, stats


def convert_torch_mobilenetv2(state_dict):
    """Convert a torchvision MobileNetV2 ``state_dict`` (reference
    BTSNet.py:304-311) into (params, batch_stats) matching
    ``encoders.MobileNetV2Encoder``.

    torchvision layout: ``features.0`` ConvBNReLU stem; ``features.1..17``
    InvertedResidual whose ``conv`` Sequential is
    ``[ConvBNReLU(dw), Conv, BN]`` for expand_ratio 1 (block 1) and
    ``[ConvBNReLU(1x1 expand), ConvBNReLU(dw), Conv, BN]`` otherwise;
    ``features.18`` ConvBNReLU head. Depthwise kernels (C,1,3,3) transpose
    to HWIO (3,3,1,C) for ``feature_group_count=C``.
    """

    def arr(key):
        v = state_dict[key]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    def bn(torch_name):
        p = {"scale": arr(f"{torch_name}.weight"), "bias": arr(f"{torch_name}.bias")}
        s = {
            "mean": arr(f"{torch_name}.running_mean"),
            "var": arr(f"{torch_name}.running_var"),
        }
        return p, s

    params: Dict = {"stem": {"kernel": _t2f(arr("features.0.0.weight"))}}
    stats: Dict = {}
    params["bn_stem"], stats["bn_stem"] = bn("features.0.1")

    for i in range(1, 18):
        t = f"features.{i}.conv"
        f = f"ir{i}"
        block_p: Dict = {}
        block_s: Dict = {}
        if f"{t}.1.0.weight" in state_dict:  # expanded block
            block_p["expand"] = {"kernel": _t2f(arr(f"{t}.0.0.weight"))}
            block_p["bn_e"], block_s["bn_e"] = bn(f"{t}.0.1")
            block_p["dw"] = {"kernel": _t2f(arr(f"{t}.1.0.weight"))}
            block_p["bn_dw"], block_s["bn_dw"] = bn(f"{t}.1.1")
            block_p["project"] = {"kernel": _t2f(arr(f"{t}.2.weight"))}
            block_p["bn_p"], block_s["bn_p"] = bn(f"{t}.3")
        else:  # expand_ratio == 1 (features.1)
            block_p["dw"] = {"kernel": _t2f(arr(f"{t}.0.0.weight"))}
            block_p["bn_dw"], block_s["bn_dw"] = bn(f"{t}.0.1")
            block_p["project"] = {"kernel": _t2f(arr(f"{t}.1.weight"))}
            block_p["bn_p"], block_s["bn_p"] = bn(f"{t}.2")
        params[f] = block_p
        stats[f] = block_s

    params["head"] = {"kernel": _t2f(arr("features.18.0.weight"))}
    params["bn_head"], stats["bn_head"] = bn("features.18.1")
    return params, stats


# BTS encoder names → (torchvision weight-file stem, converter spec).
# torchvision ResNeXt state_dicts use the exact ResNet bottleneck key layout
# (only kernel shapes differ — the same OIHW→HWIO transpose applies to
# grouped convs), so convert_torch_resnet covers them; an int spec is the
# resnet layer count, a string spec names a dedicated converter arch.
BTS_CONVERTIBLE = {
    "resnet50_bts": ("resnet50", 50),
    "resnet101_bts": ("resnet101", 101),
    "resnext50_bts": ("resnext50_32x4d", 50),
    "resnext101_bts": ("resnext101_32x8d", 101),
    "densenet121_bts": ("densenet121", "densenet121"),
    "densenet161_bts": ("densenet161", "densenet161"),
    "mobilenetv2_bts": ("mobilenet_v2", "mobilenet_v2"),
}

# arch-name spec → state_dict converter returning (params, batch_stats)
_ARCH_CONVERTERS = {
    "densenet121": lambda sd: convert_torch_densenet(sd, (6, 12, 24, 16)),
    "densenet161": lambda sd: convert_torch_densenet(sd, (6, 12, 36, 24)),
    "mobilenet_v2": convert_torch_mobilenetv2,
}


def load_pretrained_encoder(
    variables, encoder_path: Tuple[str, ...], num_layers, weights_file: Optional[str]
):
    """Inject converted ImageNet weights into an initialized variables tree.

    encoder_path: tuple path of the encoder submodule inside 'params' /
    'batch_stats' (e.g. ("depth_net", "encoder")). ``num_layers`` is a
    resnet/resnext layer count (int) or an arch name from
    ``_ARCH_CONVERTERS`` (densenet/mobilenet). Returns new variables;
    no-ops with a warning when weights are unavailable.
    """
    if not weights_file:
        logger.warning(
            f"No ImageNet weights found for encoder {num_layers}; "
            "encoder starts from random init (set SDE_TPU_PRETRAINED_DIR "
            "or MODEL.DEPTH_NET.PRETRAINED_WEIGHTS for the warm start)."
        )
        return variables

    import torch

    state_dict = torch.load(weights_file, map_location="cpu", weights_only=True)

    if isinstance(num_layers, str):
        enc_params, enc_stats = _ARCH_CONVERTERS[num_layers](state_dict)
    else:
        # detect the encoder flavor from the initialized tree: BN encoders
        # carry 'bn1'; norm-agnostic (GoogleResNet) encoders use 'n1' →
        # conv-only load
        enc_node = variables["params"]
        for p in encoder_path:
            enc_node = enc_node[p]
        if "bn1" not in enc_node and "conv1" in enc_node:
            enc_params = convert_torch_resnet_convs_only(state_dict, num_layers)
            enc_stats = {}
        else:
            enc_params, enc_stats = convert_torch_resnet(state_dict, num_layers)

    from flax.core import unfreeze, freeze

    variables = unfreeze(variables)

    def deep_set(tree, path, update):
        node = tree
        for p in path:
            node = node[p]
        _merge_into(node, update)

    def _merge_into(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                _merge_into(dst[k], v)
            else:
                assert dst[k].shape == v.shape, (
                    f"shape mismatch for {k}: {dst[k].shape} vs {v.shape}"
                )
                dst[k] = v.astype(np.asarray(dst[k]).dtype)

    deep_set(variables["params"], encoder_path, enc_params)
    if enc_stats and "batch_stats" in variables:
        deep_set(variables["batch_stats"], encoder_path, enc_stats)

    logger.info(f"Loaded ImageNet weights from {weights_file}")
    return freeze(variables) if hasattr(variables, "unfreeze") else variables
