"""AOT inference export for serving.

Serializes the depth-inference step (checkpoint weights baked in as
constants) to a portable StableHLO artifact via ``jax.export``. A serving
process deserializes and calls it without any framework/model code — the
production-deployment path the reference lacks (its closest analog is the
in-process ``tools/demo.py``/DefaultPredictor, reference
engine/defaults.py:180-238).

The artifact is platform-checked by jax.export at call time (export on the
target platform, e.g. TPU for fleet serving, CPU for tests).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

from ..config import CfgNode
from ..models import build_model

logger = logging.getLogger(__name__)


def build_inference_fn(cfg: CfgNode, allow_random_init: bool = False):
    """(params, batch_stats, model) plus ``infer(img) -> depth`` closure,
    weights restored from ``MODEL.WEIGHTS`` / ``OUTPUT_DIR``.

    A serving export of untrained weights is almost always a config mistake
    (typo'd checkpoint path), so a missing checkpoint raises unless
    ``allow_random_init`` is set (tests / smoke exports)."""
    from .runtime import restore_inference_state

    model = build_model(cfg)
    H = int(cfg.DATASETS.TEST.IMG_HEIGHT)
    W = int(cfg.DATASETS.TEST.IMG_WIDTH)
    sample = {"img": np.zeros((1, H, W, 3), np.float32)}
    state, had_checkpoint = restore_inference_state(cfg, model, sample)
    ckpt_dir = str(cfg.MODEL.WEIGHTS) or cfg.OUTPUT_DIR
    if not had_checkpoint:
        if not allow_random_init:
            raise FileNotFoundError(
                f"No checkpoint found under {ckpt_dir!r} (MODEL.WEIGHTS / "
                "OUTPUT_DIR); refusing to export random-init weights. Pass "
                "--allow-random-init / allow_random_init=True to override."
            )
        logger.warning(
            f"No checkpoint under {ckpt_dir!r}: exporting RANDOM-INIT weights"
        )

    params, batch_stats = state.params, state.batch_stats

    def infer(img: jnp.ndarray) -> jnp.ndarray:
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(variables, {"img": img}, train=False)
        return out["depth_pred"]

    return infer, (H, W)


def export_inference(
    cfg: CfgNode,
    output_path: str,
    batch: int = 1,
    shape: Optional[Tuple[int, int]] = None,
    allow_random_init: bool = False,
) -> str:
    """Export the inference step to ``output_path`` (+ ``.json`` sidecar with
    the input spec). Returns the artifact path."""
    infer, (H, W) = build_inference_fn(cfg, allow_random_init=allow_random_init)
    if shape is not None:
        H, W = shape

    spec = jax.ShapeDtypeStruct((batch, H, W, 3), jnp.float32)
    exported = jax_export.export(jax.jit(infer))(spec)
    data = exported.serialize()

    os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
    with open(output_path, "wb") as f:
        f.write(data)
    with open(output_path + ".json", "w") as f:
        json.dump(
            {
                "input": {"shape": [batch, H, W, 3], "dtype": "float32"},
                "output": "depth [B,H,W,1] (meters)",
                "platforms": list(exported.platforms),
                "meta_architecture": str(cfg.MODEL.META_ARCHITECTURE),
                "depth_net": str(cfg.MODEL.DEPTH_NET.NAME),
            },
            f,
            indent=2,
        )
    logger.info(
        f"Exported {len(data) / 1e6:.1f} MB inference artifact "
        f"({exported.platforms}) to {output_path}"
    )
    return output_path


def load_exported(path: str):
    """Deserialize an exported artifact; returns ``fn(img) -> depth``."""
    with open(path, "rb") as f:
        exported = jax_export.deserialize(bytearray(f.read()))

    def run(img):
        return exported.call(jnp.asarray(img, jnp.float32))

    return run
