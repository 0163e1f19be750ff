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


# BTS encoder names → (torchvision weight-file stem, layer count for the
# shared resnet/resnext converter). torchvision ResNeXt state_dicts use the
# exact ResNet bottleneck key layout (only kernel shapes differ — the same
# OIHW→HWIO transpose applies to grouped convs), so convert_torch_resnet
# covers them. DenseNet/MobileNet conversion is not implemented (random init
# + warning).
BTS_CONVERTIBLE = {
    "resnet50_bts": ("resnet50", 50),
    "resnet101_bts": ("resnet101", 101),
    "resnext50_bts": ("resnext50_32x4d", 50),
    "resnext101_bts": ("resnext101_32x8d", 101),
}


def load_pretrained_encoder(
    variables, encoder_path: Tuple[str, ...], num_layers: int, weights_file: Optional[str]
):
    """Inject converted ImageNet weights into an initialized variables tree.

    encoder_path: tuple path of the encoder submodule inside 'params' /
    'batch_stats' (e.g. ("depth_net", "encoder")). Returns new variables;
    no-ops with a warning when weights are unavailable.
    """
    if not weights_file:
        logger.warning(
            f"No ImageNet weights found for resnet{num_layers}; "
            "encoder starts from random init (set SDE_TPU_PRETRAINED_DIR "
            "or MODEL.DEPTH_NET.PRETRAINED_WEIGHTS for the warm start)."
        )
        return variables

    import torch

    state_dict = torch.load(weights_file, map_location="cpu", weights_only=True)

    # detect the encoder flavor from the initialized tree: BN encoders carry
    # 'bn1'; norm-agnostic (GoogleResNet) encoders use 'n1' → conv-only load
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
