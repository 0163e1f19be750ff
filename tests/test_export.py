"""AOT inference export: serialize the eval step with baked weights,
deserialize without model code, verify output parity with the live model."""

import numpy as np

import jax

from simpledepthestimation_tpu.config import CfgNode, get_cfg
from simpledepthestimation_tpu.engine.export import (
    build_inference_fn,
    export_inference,
    load_exported,
)


def _cfg(tmp_path):
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "SupDepthModel"
    cfg.MODEL.DEPTH_NET.NAME = "DepthResNet"
    cfg.MODEL.DEPTH_NET.ENCODER_NAME = "18"
    cfg.MODEL.DEPTH_NET.UPSAMPLE_DEPTH = False
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.DATASETS.TEST.IMG_HEIGHT = 64
    cfg.DATASETS.TEST.IMG_WIDTH = 96
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    return cfg


def test_export_roundtrip(tmp_path, rng):
    cfg = _cfg(tmp_path)
    # no checkpoint on disk: refuses by default (serving-safety), proceeds
    # from the (deterministic) init only when explicitly allowed
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="random-init"):
        export_inference(cfg, str(tmp_path / "model.shlo"))
    path = export_inference(
        cfg, str(tmp_path / "model.shlo"), allow_random_init=True
    )

    img = rng.rand(1, 64, 96, 3).astype(np.float32)
    infer, _ = build_inference_fn(cfg, allow_random_init=True)
    live = np.asarray(jax.jit(infer)(img))

    served = load_exported(path)
    out = np.asarray(served(img))
    assert out.shape == (1, 64, 96, 1)
    np.testing.assert_allclose(out, live, atol=1e-5)

    # sidecar documents the input spec
    import json

    meta = json.load(open(path + ".json"))
    assert meta["input"]["shape"] == [1, 64, 96, 3]
