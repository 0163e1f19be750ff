"""Full-model conversion of reference (PyTorch) checkpoints → Flax variables.

The reference framework (detectron2-trimmed, /root/reference) saves torch
``state_dict`` checkpoints. This module converts every reference model family
into our parameter/batch-stats trees so that

1. users migrating from the reference can bring trained checkpoints
   (``tools/import_torch_checkpoint.py``), and
2. the parity harness (tests/test_reference_parity.py) can prove full-model
   numerical equivalence against the reference's own code.

Layout rules: torch conv OIHW → flax HWIO; torch Conv3d [O,1,kD,kH,kW] →
DHWIO; BatchNorm weight/bias → scale/bias with running stats in
batch_stats; GroupNorm/LayerNorm weight/bias → scale/bias. Module naming
follows each converter's docstring citation of the reference source.

Every converter takes a flat ``state_dict``-like mapping (torch tensors or
numpy arrays) and returns ``(params, batch_stats)`` nested dicts matching
``model.init``'s tree for the corresponding Flax module.
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from .pretrained import _t2f, convert_torch_resnet, convert_torch_resnet_convs_only

logger = logging.getLogger(__name__)

Tree = Dict[str, Any]


def _arr(v) -> np.ndarray:
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)


def _sub(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _conv(sd, key: str, bias: bool = True) -> Tree:
    p: Tree = {"kernel": _t2f(_arr(sd[f"{key}.weight"]))}
    if bias and f"{key}.bias" in sd:
        p["bias"] = _arr(sd[f"{key}.bias"])
    return p


def _conv3d(sd, key: str) -> Tuple[np.ndarray, np.ndarray]:
    """torch Conv3d [O,1,kD,kH,kW] → flax DHWIO [kD,kH,kW,1,O] (+bias)."""
    w = _arr(sd[f"{key}.weight"]).transpose(2, 3, 4, 1, 0)
    return w, _arr(sd[f"{key}.bias"])


def _affine(sd, key: str) -> Tree:
    return {"scale": _arr(sd[f"{key}.weight"]), "bias": _arr(sd[f"{key}.bias"])}


def _bn(sd, key: str) -> Tuple[Tree, Tree]:
    return _affine(sd, key), {
        "mean": _arr(sd[f"{key}.running_mean"]),
        "var": _arr(sd[f"{key}.running_var"]),
    }


# ---------------------------------------------------------------------------
# DepthResNet (reference detectron2/modeling/depth_net/DepthResNet.py:14-70)
# ---------------------------------------------------------------------------


def convert_depth_decoder(sd: Mapping[str, Any], prefix: str = "decoder.") -> Tree:
    """Monodepth2 DepthDecoder (reference layers/depth_decoder.py:62-110).

    The torch decoder registers its OrderedDict convs as ``ModuleList``
    indices 0..13: (upconv,i,0)/(upconv,i,1) for i=4..0, then (dispconv,s)
    for s=0..3. ConvBlock nests Conv3x3 (``.conv.conv``); dispconv is a bare
    Conv3x3 (``.conv``).
    """
    params: Tree = {}
    idx = 0
    for i in range(4, -1, -1):
        for j in range(2):
            params[f"upconv_{i}_{j}"] = {
                "conv": {"conv": _conv(sd, f"{prefix}{idx}.conv.conv")}
            }
            idx += 1
    for s in range(4):
        params[f"dispconv_{s}"] = {"conv": _conv(sd, f"{prefix}{idx}.conv")}
        idx += 1
    return params


def convert_depth_resnet(sd: Mapping[str, Any], num_layers: int) -> Tuple[Tree, Tree]:
    """Full DepthResNet: torchvision encoder (``encoder.encoder.*``) +
    DepthDecoder (``decoder.decoder.*``)."""
    enc_p, enc_s = convert_torch_resnet(_sub(sd, "encoder.encoder."), num_layers)
    dec_p = convert_depth_decoder(sd, prefix="decoder.decoder.")
    return {"encoder": enc_p, "decoder": dec_p}, {"encoder": enc_s}


# ---------------------------------------------------------------------------
# PoseNet family (reference detectron2/modeling/pose_net/)
# ---------------------------------------------------------------------------


def _conv_gn_relu(sd, key: str, group_norm: bool = True) -> Tree:
    """conv_gn_relu Sequential (reference PoseNet.py:13-19): index 0 = conv,
    index 1 = GroupNorm when present."""
    p: Tree = {"conv": _conv(sd, f"{key}.0")}
    if group_norm and f"{key}.1.weight" in sd:
        p["gn"] = _affine(sd, f"{key}.1")
    return p


def convert_posenet(sd: Mapping[str, Any]) -> Tuple[Tree, Tree]:
    """SfmLearner PoseNet (reference PoseNet.py:22-65): 7 conv_gn_relu +
    1×1 ``pose_pred`` head (flax name ``pose_head``)."""
    params: Tree = {}
    for i in range(1, 8):
        params[f"conv{i}"] = _conv_gn_relu(sd, f"conv{i}")
    params["pose_head"] = _conv(sd, "pose_pred")
    return params, {}


def convert_google_posenet(sd: Mapping[str, Any]) -> Tuple[Tree, Tree]:
    """GooglePoseNet (reference GooglePoseNet.py:30-86)."""
    params: Tree = {}
    for i in range(1, 8):
        params[f"conv{i}"] = _conv_gn_relu(sd, f"conv{i}")
    params["pose_pred"] = _conv(sd, "pose_pred")
    for scale in ("rot_scale", "trans_scale"):
        if scale in sd:
            params[scale] = _arr(sd[scale]).reshape(())
    return params, {}


def convert_google_motion_net(sd: Mapping[str, Any]) -> Tuple[Tree, Tree]:
    """GoogleMotionNet (reference GooglePoseNet.py:110-208): 7-conv trunk,
    bias-free pose head, 1×1 seed ``conv8``, refiners 7..0 (conv1/conv21/
    conv22 conv_gn_relu + bias-free 1×1 ``conv3``), learned scales."""
    params: Tree = {}
    for i in range(1, 8):
        params[f"conv{i}"] = _conv_gn_relu(sd, f"conv{i}")
    params["pose_pred"] = _conv(sd, "pose_pred", bias=False)
    params["conv8"] = _conv(sd, "conv8")
    for lvl in range(8):
        key = f"refiner{lvl}"
        params[key] = {
            "conv1": _conv_gn_relu(sd, f"{key}.conv1"),
            "conv21": _conv_gn_relu(sd, f"{key}.conv21"),
            "conv22": _conv_gn_relu(sd, f"{key}.conv22"),
            "conv3": _conv(sd, f"{key}.conv3", bias=False),
        }
    for scale in ("rot_scale", "trans_scale"):
        if scale in sd:
            params[scale] = _arr(sd[scale]).reshape(())
    return params, {}


# ---------------------------------------------------------------------------
# GoogleResNet (reference detectron2/modeling/depth_net/GoogleResNet.py)
# ---------------------------------------------------------------------------


def _norm_wrap(norm: str, p: Tree, s: Optional[Tree]) -> Tuple[Tree, Tree]:
    """Wrap converted norm params into the _Norm dispatch submodule naming
    (models/google_resnet.py: 'bn' under BatchNorm, 'rln' under randLN)."""
    if norm == "BN":
        return {"bn": p}, ({"bn": s} if s else {})
    return {"rln": p}, {}


def convert_google_resnet_encoder(
    sd: Mapping[str, Any], num_layers: int, norm: str = "BN"
) -> Tuple[Tree, Tree]:
    """ResNetTF-based encoder (reference GoogleResNet.py:21-69 over
    layers/resnet.py:35-57): torchvision naming but the downsample is a bare
    conv1x1 (``downsample.0``) with NO norm."""
    from .resnet import BLOCKS, BOTTLENECK

    def norm_at(tkey):
        if norm == "BN":
            p, s = _bn(sd, tkey)
        else:
            p, s = _affine(sd, tkey), None
        return _norm_wrap(norm, p, s)

    params: Tree = {"conv1": _conv(sd, "conv1", bias=False)}
    stats: Tree = {}
    params["n1"], s1 = norm_at("bn1")
    if s1:
        stats["n1"] = s1

    n_convs = 3 if BOTTLENECK[num_layers] else 2
    for li, n_blocks in enumerate(BLOCKS[num_layers], start=1):
        for b in range(n_blocks):
            t = f"layer{li}.{b}"
            f = f"layer{li}_{b}"
            bp: Tree = {}
            bs: Tree = {}
            for c in range(1, n_convs + 1):
                bp[f"conv{c}"] = _conv(sd, f"{t}.conv{c}", bias=False)
                bp[f"n{c}"], sc = norm_at(f"{t}.bn{c}")
                if sc:
                    bs[f"n{c}"] = sc
            if f"{t}.downsample.0.weight" in sd:
                bp["down_conv"] = _conv(sd, f"{t}.downsample.0", bias=False)
            params[f] = bp
            if bs:
                stats[f] = bs
    return params, stats


def convert_google_depth_decoder(sd: Mapping[str, Any]) -> Tree:
    """Bilinear-upsample decoder (reference GoogleResNet.py:72-123):
    ``blocks.{k}`` for i=4..0 → flax ``block{i}``, plus ``out_conv`` and the
    optional learned ``scale``."""
    params: Tree = {}
    for k, i in enumerate(range(4, -1, -1)):
        params[f"block{i}"] = {
            "upconv": _conv(sd, f"blocks.{k}.upconv"),
            "iconv": _conv(sd, f"blocks.{k}.iconv"),
        }
    params["out_conv"] = _conv(sd, "out_conv")
    if "scale" in sd:
        params["scale"] = _arr(sd["scale"]).reshape((1,))
    return params


def convert_google_resnet(
    sd: Mapping[str, Any], num_layers: int, norm: str = "BN"
) -> Tuple[Tree, Tree]:
    enc_p, enc_s = convert_google_resnet_encoder(
        _sub(sd, "encoder.encoder."), num_layers, norm
    )
    dec_p = convert_google_depth_decoder(_sub(sd, "decoder."))
    params = {"encoder": enc_p, "decoder": dec_p}
    stats = {"encoder": enc_s} if enc_s else {}
    return params, stats


# ---------------------------------------------------------------------------
# PackNet01 (reference detectron2/modeling/depth_net/PackNet01.py +
# layers/layers01.py)
# ---------------------------------------------------------------------------


def _packnet_conv2d(sd, key: str) -> Tree:
    """layers01 Conv2D: ``conv_base`` + GroupNorm ``normalize``."""
    return {"conv": _conv(sd, f"{key}.conv_base"), "gn": _affine(sd, f"{key}.normalize")}


def _packnet_residual(sd, key: str, num_blocks: int) -> Tree:
    """ResidualBlock = Sequential of ResidualConv (layers01.py:42-98)."""
    out: Tree = {}
    for b in range(num_blocks):
        t = f"{key}.{b}"
        out[f"res{b}"] = {
            "conv1": _packnet_conv2d(sd, f"{t}.conv1"),
            "conv2": _packnet_conv2d(sd, f"{t}.conv2"),
            "conv3": _conv(sd, f"{t}.conv3"),
            "gn": _affine(sd, f"{t}.normalize"),
        }
    return out


def _packnet_pack(sd, key: str) -> Tree:
    k3, b3 = _conv3d(sd, f"{key}.conv3d")
    return {
        "conv": _packnet_conv2d(sd, f"{key}.conv"),
        "conv3d_kernel": k3,
        "conv3d_bias": b3,
    }


def convert_packnet(sd: Mapping[str, Any]) -> Tuple[Tree, Tree]:
    """PackNet01 (reference PackNet01.py:36-110). The 3D-conv channel fold
    is d-major on both sides (models/packnet.py ``_conv3d_over_packed``), so
    all mappings are pure layout transposes."""
    num_blocks = (2, 2, 3, 3)
    params: Tree = {"pre_calc": _packnet_conv2d(sd, "pre_calc")}
    params["conv1"] = _packnet_conv2d(sd, "conv1")
    for i, nb in enumerate(num_blocks, start=2):
        params[f"conv{i}"] = _packnet_residual(sd, f"conv{i}", nb)
    for i in range(1, 6):
        params[f"pack{i}"] = _packnet_pack(sd, f"pack{i}")
        params[f"unpack{i}"] = _packnet_pack(sd, f"unpack{i}")
    for i in range(1, 6):
        params[f"iconv{i}"] = _packnet_conv2d(sd, f"iconv{i}")
    for i in range(1, 5):
        params[f"disp{i}"] = {"conv": _conv(sd, f"disp{i}_layer.conv1")}
    return params, {}


# ---------------------------------------------------------------------------
# BTS (reference detectron2/modeling/depth_net/BTSNet.py)
# ---------------------------------------------------------------------------


def _bts_atrous(sd, key: str, apply_bn_first: bool = True) -> Tuple[Tree, Tree]:
    """atrous_conv (BTSNet.py:39-64): optional first_bn, then
    aconv_sequence = [ReLU, conv1, BN, ReLU, conv2]."""
    params: Tree = {}
    stats: Tree = {}
    base = f"{key}.atrous_conv"
    if apply_bn_first:
        params["first_bn"], stats["first_bn"] = _bn(sd, f"{base}.first_bn")
    params["conv1"] = _conv(sd, f"{base}.aconv_sequence.1", bias=False)
    params["bn2"], stats["bn2"] = _bn(sd, f"{base}.aconv_sequence.2")
    params["conv2"] = _conv(sd, f"{base}.aconv_sequence.4", bias=False)
    return params, stats


def _bts_reduction(sd, key: str, is_final: bool = False) -> Tree:
    """reduction_1x1 (BTSNet.py:82-123): ``inter_{in}_{out}`` halving chain
    (flax: sequential ``inter_{k}``) then ``plane_params`` or ``final``."""
    inter_keys = sorted(
        {
            m.group(1)
            for k in sd
            if (m := re.match(rf"{re.escape(key)}\.reduc\.(inter_\d+_\d+)\.0\.weight$", k))
        },
        key=lambda name: (-int(name.split("_")[1]), -int(name.split("_")[2])),
    )  # descending (in_filters, out_filters): the reference chain halves
    # num_out each step but the first conv may keep in == out (BTSNet.py:90-109)
    params: Tree = {}
    for k_idx, name in enumerate(inter_keys):
        params[f"inter_{k_idx}"] = _conv(sd, f"{key}.reduc.{name}.0", bias=False)
    if is_final:
        params["final"] = _conv(sd, f"{key}.reduc.final.0", bias=False)
    else:
        params["plane_params"] = _conv(sd, f"{key}.reduc.plane_params", bias=False)
    return params


def convert_bts_decoder(sd: Mapping[str, Any]) -> Tuple[Tree, Tree]:
    """bts decoder (BTSNet.py:151-273)."""
    params: Tree = {}
    stats: Tree = {}

    for name in ("upconv5", "upconv4", "upconv3", "upconv2", "upconv1"):
        params[name] = {"conv": _conv(sd, f"{name}.conv", bias=False)}
    for name in ("bn5", "bn4", "bn4_2", "bn3", "bn2"):
        params[name], stats[name] = _bn(sd, name)
    for name in ("conv5", "conv4", "conv3", "conv2", "conv1", "daspp_conv", "get_depth"):
        params[name] = _conv(sd, f"{name}.0", bias=False)

    p, s = _bts_atrous(sd, "daspp_3", apply_bn_first=False)
    params["daspp_3"], stats["daspp_3"] = p, s
    for name in ("daspp_6", "daspp_12", "daspp_18", "daspp_24"):
        params[name], stats[name] = _bts_atrous(sd, name)

    for name in ("reduc8x8", "reduc4x4", "reduc2x2"):
        params[name] = _bts_reduction(sd, name)
    params["reduc1x1"] = _bts_reduction(sd, "reduc1x1", is_final=True)
    return params, stats


def convert_bts(sd: Mapping[str, Any], encoder: Any = 50) -> Tuple[Tree, Tree]:
    """Full BtsModel checkpoint for ANY reference encoder
    (BTSNet.py:278-333 zoo).

    ``encoder`` is the BTS encoder name ('resnet50_bts', 'resnext101_bts',
    'densenet161_bts', 'mobilenetv2_bts', …) or, back-compat, a bare resnet
    layer count. For densenet/mobilenet the reference's ``base_model`` IS
    torchvision's ``.features``, so the stripped keys get the ``features.``
    prefix restored before reusing the pretrained-zoo converters; resnext
    shares the resnet key layout (pretrained.py BTS_CONVERTIBLE)."""
    enc_sd = {
        k: v
        for k, v in _sub(sd, "encoder.base_model.").items()
        if not k.startswith(("fc.", "avgpool.", "classifier."))
    }
    name = str(encoder)
    if "densenet" in name:
        from .pretrained import convert_torch_densenet

        blocks = (6, 12, 24, 16) if "121" in name else (6, 12, 36, 24)
        enc_p, enc_s = convert_torch_densenet(
            {f"features.{k}": v for k, v in enc_sd.items()}, blocks
        )
    elif "mobilenet" in name:
        from .pretrained import convert_torch_mobilenetv2

        enc_p, enc_s = convert_torch_mobilenetv2(
            {f"features.{k}": v for k, v in enc_sd.items()}
        )
    else:
        num_layers = int(re.search(r"\d+", name).group())
        enc_p, enc_s = convert_torch_resnet(enc_sd, num_layers)
    dec_p, dec_s = convert_bts_decoder(_sub(sd, "decoder."))
    return (
        {"encoder": enc_p, "decoder": dec_p},
        {"encoder": enc_s, "decoder": dec_s},
    )


# ---------------------------------------------------------------------------
# Meta-architecture assembly
# ---------------------------------------------------------------------------

_DEPTH_NET_CONVERTERS = {
    "DepthResNet": lambda sd, cfg: convert_depth_resnet(
        sd, int(str(cfg.MODEL.DEPTH_NET.ENCODER_NAME)[:2])
    ),
    "PackNet01": lambda sd, cfg: convert_packnet(sd),
    "BtsModel": lambda sd, cfg: convert_bts(
        sd, str(cfg.MODEL.DEPTH_NET.ENCODER_NAME)
    ),
    "GoogleResNet": lambda sd, cfg: convert_google_resnet(
        sd,
        int(str(cfg.MODEL.DEPTH_NET.ENCODER_NAME)[:2]),
        str(cfg.MODEL.DEPTH_NET.get("NORM", "BN") or "BN"),
    ),
}

_POSE_NET_CONVERTERS = {
    "PoseNet": lambda sd, cfg: convert_posenet(sd),
    "GooglePoseNet": lambda sd, cfg: convert_google_posenet(sd),
    "GoogleMotionNet": lambda sd, cfg: convert_google_motion_net(sd),
}


def convert_meta_arch(sd: Mapping[str, Any], cfg) -> Tuple[Tree, Tree]:
    """Convert a reference meta-arch ``state_dict`` (SupDepthModel /
    MonoDepth2Model / MotionLearningModel — all are ``depth_net.*`` [+
    ``pose_net.*``] + pixel_mean/std buffers) into our meta-arch variables
    tree. Returns (params, batch_stats)."""
    depth_name = str(cfg.MODEL.DEPTH_NET.NAME)
    if depth_name not in _DEPTH_NET_CONVERTERS:
        raise NotImplementedError(f"no torch importer for depth net {depth_name}")
    dn_p, dn_s = _DEPTH_NET_CONVERTERS[depth_name](_sub(sd, "depth_net."), cfg)
    params: Tree = {"depth_net": dn_p}
    stats: Tree = {"depth_net": dn_s} if dn_s else {}

    pose_sd = _sub(sd, "pose_net.")
    if pose_sd:
        pose_name = str(cfg.MODEL.POSE_NET.NAME)
        if pose_name not in _POSE_NET_CONVERTERS:
            raise NotImplementedError(f"no torch importer for pose net {pose_name}")
        pn_p, pn_s = _POSE_NET_CONVERTERS[pose_name](pose_sd, cfg)
        params["pose_net"] = pn_p
        if pn_s:
            stats["pose_net"] = pn_s
    return params, stats


def _assert_tree_match(converted: Tree, template: Tree, path: str = ""):
    """Every converted leaf must exist in the template with the same shape;
    every template leaf must be covered (strict import — a silent partial
    load would defeat checkpoint migration)."""
    t_keys = set(template)
    c_keys = set(converted)
    if missing := t_keys - c_keys:
        raise ValueError(f"converter missing keys at {path or '/'}: {sorted(missing)}")
    if extra := c_keys - t_keys:
        raise ValueError(f"converter produced unknown keys at {path or '/'}: {sorted(extra)}")
    for k in t_keys:
        tv, cv = template[k], converted[k]
        if isinstance(tv, dict):
            _assert_tree_match(cv, tv, f"{path}{k}.")
        else:
            t_shape = tuple(np.shape(tv))
            c_shape = tuple(np.shape(cv))
            if t_shape != c_shape:
                raise ValueError(
                    f"shape mismatch at {path}{k}: checkpoint {c_shape} vs model {t_shape}"
                )


def apply_torch_checkpoint(variables: Tree, sd: Mapping[str, Any], cfg) -> Tree:
    """Replace an initialized variables tree's params/batch_stats with the
    converted reference checkpoint (strict: trees must match exactly).

    ``sd`` may be a bare meta-arch state_dict or the reference Checkpointer
    payload ``{"model": state_dict, ...}`` (reference
    checkpoint/checkpoint.py:9-45)."""
    from flax.core import unfreeze

    if "model" in sd and not any(k.startswith(("depth_net.", "pose_net.")) for k in sd):
        sd = sd["model"]
    sd = {k: v for k, v in sd.items() if not k.endswith("num_batches_tracked")}

    params, stats = convert_meta_arch(sd, cfg)
    variables = dict(unfreeze(variables))

    def to_plain(tree):
        return (
            {k: to_plain(v) for k, v in tree.items()} if hasattr(tree, "items") else tree
        )

    template_params = to_plain(variables["params"])
    _assert_tree_match(params, template_params)

    def cast_like(conv, tmpl):
        if isinstance(tmpl, dict):
            return {k: cast_like(conv[k], tmpl[k]) for k in tmpl}
        return np.asarray(conv).astype(np.asarray(tmpl).dtype)

    variables["params"] = cast_like(params, template_params)
    if "batch_stats" in variables:
        template_stats = to_plain(variables["batch_stats"])
        _assert_tree_match(stats, template_stats)
        variables["batch_stats"] = cast_like(stats, template_stats)
    logger.info("Imported reference torch checkpoint (strict tree match)")
    return variables
