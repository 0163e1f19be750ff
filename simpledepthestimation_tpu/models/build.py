"""Model registries and builders.

Parity with reference detectron2/modeling/{meta_arch,depth_net,pose_net}/build.py:
string names in yaml select the meta-architecture and its sub-nets. Builders
return Flax module instances (pure, no device placement — sharding happens at
the train-step level).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.registry import Registry

META_ARCH_REGISTRY = Registry("META_ARCH")
DEPTH_NET_REGISTRY = Registry("DEPTH_NET")
POSE_NET_REGISTRY = Registry("POSE_NET")


def compute_dtype(cfg) -> jnp.dtype:
    name = cfg.TPU.get("COMPUTE_DTYPE", "float32") if "TPU" in cfg else "float32"
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


def build_depth_net(cfg):
    name = cfg.MODEL.DEPTH_NET.NAME
    return DEPTH_NET_REGISTRY.get(name).from_cfg(cfg)


def build_pose_net(cfg):
    name = cfg.MODEL.POSE_NET.NAME
    return POSE_NET_REGISTRY.get(name).from_cfg(cfg)


def build_model(cfg):
    """Build the meta-architecture module named by cfg.MODEL.META_ARCHITECTURE."""
    from ..ops.resample import set_warp_impl

    if bool(cfg.get("PARITY", {}).get("STRICT", False)):
        # strict parity: pure gather warp (bit-compatible with grid_sample)
        set_warp_impl("gather")
    else:
        set_warp_impl(
            str(cfg.TPU.get("WARP_IMPL", "auto")),
            window=int(cfg.TPU.get("WARP_WINDOW", 128)),
            xwin=int(cfg.TPU.get("WARP_XWIN", 512)),
            ywin=int(cfg.TPU.get("WARP_YWIN", 96)),
            tile_h=int(cfg.TPU.get("WARP_TILE_H", 8)),
            ywin_narrow=int(cfg.TPU.get("WARP_YWIN_NARROW", 48)),
            ywin_bwd=int(cfg.TPU.get("WARP_YWIN_BWD", 0)),
        )
    from .packnet import set_conv3d_impl

    set_conv3d_impl(
        str(cfg.TPU.get("CONV3D_IMPL", "auto")),
        block=int(cfg.TPU.get("CONV3D_BLOCK", 30)),
    )
    meta_arch = cfg.MODEL.META_ARCHITECTURE
    return META_ARCH_REGISTRY.get(meta_arch).from_cfg(cfg)
