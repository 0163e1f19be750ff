"""Depth networks.

``DepthResNet`` is the behavioral equivalent of reference
detectron2/modeling/depth_net/DepthResNet.py:14-70 — ResNet encoder + U-Net
decoder, softplus disparity at 4 scales mapped through ``disp_to_depth`` to
[0.1, MAX_DEPTH] — with the reference's python-level batch flip flag
re-expressed as a traced per-sample boolean (jit-safe ``jnp.where``).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .build import DEPTH_NET_REGISTRY, compute_dtype
from .layers import disp_to_depth
from .resnet import ResNetEncoder
from .depth_decoder import DepthDecoder
from ..geometry.camera import resize_img


def parse_encoder_version(version) -> Tuple[int, bool]:
    """'18pt' → (18, pretrained=True); '50' → (50, False)
    (reference DepthResNet.py:34-37). A bare CLI override like
    ``MODEL.DEPTH_NET.ENCODER_NAME 18`` literal-parses to an int — coerce."""
    version = str(version)
    num_layers = int(version[:2])
    pretrained = version[2:] == "pt"
    assert num_layers in (18, 34, 50), f"ResNet version {num_layers} not available"
    return num_layers, pretrained


def flip_images(x: jnp.ndarray, flip: jnp.ndarray) -> jnp.ndarray:
    """Horizontally flip samples where ``flip`` is True. x: [B,H,W,C], flip: [B]."""
    return jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)


@DEPTH_NET_REGISTRY.register()
class DepthResNet(nn.Module):
    num_layers: int = 18
    pretrained: bool = False
    max_depth: float = 80.0
    upsample_depth: bool = False
    dtype: Any = jnp.float32

    @classmethod
    def from_cfg(cls, cfg):
        num_layers, pretrained = parse_encoder_version(cfg.MODEL.DEPTH_NET.ENCODER_NAME)
        return cls(
            num_layers=num_layers,
            pretrained=pretrained,
            max_depth=float(cfg.MODEL.MAX_DEPTH),
            upsample_depth=bool(cfg.MODEL.DEPTH_NET.get("UPSAMPLE_DEPTH", False)),
            dtype=compute_dtype(cfg),
        )

    @nn.compact
    def __call__(
        self,
        image: jnp.ndarray,
        flip: Optional[jnp.ndarray] = None,
        train: bool = False,
        intrinsics: Optional[jnp.ndarray] = None,
    ) -> List[jnp.ndarray]:
        """image: [B,H,W,3] normalized. Returns 4 depth maps [B,h,w,1],
        index 0 = full resolution. ``intrinsics`` is accepted for interface
        uniformity (used by BTS for focal scaling) and ignored here."""
        if flip is not None:
            image = flip_images(image, flip)

        encoder = ResNetEncoder(num_layers=self.num_layers, dtype=self.dtype, name="encoder")
        features = encoder(image, train=train)
        disps = DepthDecoder(
            num_ch_enc=encoder.num_ch_enc, dtype=self.dtype, name="decoder"
        )(features)

        depths = []
        for i in range(4):
            _, depth = disp_to_depth(
                disps[i].astype(jnp.float32), min_depth=0.1, max_depth=self.max_depth
            )
            depths.append(depth)

        if flip is not None:
            depths = [flip_images(d, flip) for d in depths]

        if self.upsample_depth:
            depths = [resize_img(d, image.shape[1:3], mode="nearest") for d in depths]

        return depths
