import os
import textwrap

import pytest

from simpledepthestimation_tpu.config import CfgNode, get_cfg, load_yaml_with_base


def test_defaults_schema():
    cfg = get_cfg()
    assert cfg.MODEL.MAX_DEPTH == 80
    assert cfg.SOLVER.IMS_PER_BATCH == 16
    assert cfg.TPU.MESH_AXES == ("data",)


def test_attribute_access_and_new_keys():
    cfg = get_cfg()
    cfg.LOSS.SSIM_WEIGHT = 0.85
    assert cfg.LOSS.SSIM_WEIGHT == 0.85
    assert cfg["LOSS"]["SSIM_WEIGHT"] == 0.85


def test_freeze():
    cfg = get_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.SOLVER.MAX_EPOCHS = 5
    cfg.defrost()
    cfg.SOLVER.MAX_EPOCHS = 5
    assert cfg.SOLVER.MAX_EPOCHS == 5


def test_merge_from_list_types():
    cfg = get_cfg()
    cfg.merge_from_list(["SOLVER.MAX_EPOCHS", "30", "SOLVER.DEPTH_LR", "0.0002"])
    assert cfg.SOLVER.MAX_EPOCHS == 30
    assert abs(cfg.SOLVER.DEPTH_LR - 0.0002) < 1e-12
    # tuples survive
    cfg.merge_from_list(["EVALUATORS", "('kitti_evaluator',)"])
    assert cfg.EVALUATORS == ("kitti_evaluator",)


def test_base_inheritance(tmp_path):
    base = tmp_path / "Base.yaml"
    base.write_text(
        textwrap.dedent(
            """
            MODEL:
              META_ARCHITECTURE: "MonoDepth2Model"
              MAX_DEPTH: 80
            LOSS:
              SSIM_WEIGHT: 0.85
            SOLVER:
              LR_STEPS: (15,)
            """
        )
    )
    child = tmp_path / "child.yaml"
    child.write_text(
        textwrap.dedent(
            """
            _BASE_: "./Base.yaml"
            MODEL:
              DEPTH_NET:
                NAME: "DepthResNet"
            SOLVER:
              IMS_PER_BATCH: 8
            """
        )
    )
    cfg = get_cfg()
    cfg.merge_from_file(str(child))
    assert cfg.MODEL.META_ARCHITECTURE == "MonoDepth2Model"
    assert cfg.MODEL.DEPTH_NET.NAME == "DepthResNet"
    assert cfg.SOLVER.IMS_PER_BATCH == 8
    assert cfg.LOSS.SSIM_WEIGHT == 0.85
    # python-ish tuple parsed via literal fallback
    assert cfg.SOLVER.LR_STEPS == (15,)


def test_preprocess_list_of_dicts(tmp_path):
    f = tmp_path / "cfg.yaml"
    f.write_text(
        textwrap.dedent(
            """
            DATASETS:
              TRAIN:
                PREPROCESS:
                  - NAME: LoadImg
                    WITH_CTX: true
                  - NAME: Resize
                    IMG_W: 640
                    IMG_H: 192
            """
        )
    )
    cfg = get_cfg()
    cfg.merge_from_file(str(f))
    pp = cfg.DATASETS.TRAIN.PREPROCESS
    assert len(pp) == 2
    assert pp[0].NAME == "LoadImg"
    assert pp[0].WITH_CTX is True
    assert pp[1].IMG_W == 640


def test_clone_independent():
    cfg = get_cfg()
    cfg2 = cfg.clone()
    cfg2.SOLVER.MAX_EPOCHS = 99
    assert cfg.SOLVER.MAX_EPOCHS != 99


def test_dump_roundtrip():
    import yaml

    cfg = get_cfg()
    cfg.LOSS.NEW_KEY = [1, 2, 3]
    d = yaml.safe_load(cfg.dump())
    assert d["LOSS"]["NEW_KEY"] == [1, 2, 3]
