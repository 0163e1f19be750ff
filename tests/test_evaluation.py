"""Evaluation suite tests: metric formulas, crops, gt-scaling, inverse
preprocess inside the evaluator, banded variants."""

import numpy as np
import pytest

from simpledepthestimation_tpu.config import CfgNode, get_cfg
from simpledepthestimation_tpu.evaluation import (
    compute_errors,
    garg_crop,
    eigen_crop,
    build_evaluator,
    DatasetEvaluators,
)


def test_compute_errors_perfect():
    gt = np.random.RandomState(0).uniform(1, 80, 1000).astype(np.float64)
    silog, log10, abs_rel, sq_rel, rms, log_rms, d1, d2, d3 = compute_errors(gt, gt)
    assert abs_rel == 0 and sq_rel == 0 and rms == 0
    assert d1 == d2 == d3 == 1.0
    assert silog <= 0.011 and log10 == 0  # silog floor = sqrt(1e-8)*100


def test_compute_errors_formulas():
    gt = np.array([10.0, 20.0, 40.0])
    pred = np.array([12.0, 18.0, 50.0])
    silog, log10, abs_rel, sq_rel, rms, log_rms, d1, d2, d3 = compute_errors(gt, pred)
    np.testing.assert_allclose(abs_rel, np.mean(np.abs(gt - pred) / gt))
    np.testing.assert_allclose(sq_rel, np.mean((gt - pred) ** 2 / gt))
    np.testing.assert_allclose(rms, np.sqrt(np.mean((gt - pred) ** 2)))
    thresh = np.maximum(gt / pred, pred / gt)
    np.testing.assert_allclose(d1, (thresh < 1.25).mean())


def test_garg_crop_fractions():
    pred = np.ones((375, 1242))
    gt = np.ones((375, 1242))
    p, g = garg_crop(pred, gt)
    assert p.shape == g.shape
    assert p.shape[0] == int(0.99189189 * 375) - int(0.40810811 * 375)
    assert p.shape[1] == int(0.96405229 * 1242) - int(0.03594771 * 1242)
    p2, _ = eigen_crop(pred, gt)
    assert p2.shape[0] == int(0.91351351 * 375) - int(0.3324324 * 375)


def _eval_cfg(gt_scale=False):
    cfg = get_cfg()
    cfg.TEST.GT_SCALE = gt_scale
    cfg.EVALUATORS = ("kitti_evaluator",)
    cfg.DATASETS.TEST.PREPROCESS = []
    return cfg


def _fake_inputs(pred_scale=1.0, H=100, W=300):
    rng = np.random.RandomState(0)
    gt = rng.uniform(2, 60, (1, H, W)).astype(np.float32)
    pred = gt * pred_scale
    inputs = {"depth_orig": gt, "metadata": [{"idx": 0}]}
    outputs = {"depth_pred": pred[..., None]}
    return inputs, outputs


def test_kitti_evaluator_perfect_prediction():
    cfg = _eval_cfg()
    (ev,) = build_evaluator(cfg, None)
    ev.reset()
    ev.process(*_fake_inputs())
    results = ev.evaluate()
    m = results["kitti evaluator"]
    assert m["abs_rel"] < 1e-6 and m["d1"] == 1.0


def test_gt_scale_fixes_scale_ambiguity():
    """A prediction off by a global scale is perfect under median scaling."""
    cfg = _eval_cfg(gt_scale=True)
    (ev,) = build_evaluator(cfg, None)
    ev.reset()
    ev.process(*_fake_inputs(pred_scale=0.3))
    m = ev.evaluate()["kitti evaluator"]
    assert m["abs_rel"] < 1e-6

    cfg = _eval_cfg(gt_scale=False)
    (ev,) = build_evaluator(cfg, None)
    ev.reset()
    ev.process(*_fake_inputs(pred_scale=0.3))
    m = ev.evaluate()["kitti evaluator"]
    assert m["abs_rel"] > 0.5


def test_banded_evaluators_partition():
    cfg = get_cfg()
    cfg.TEST.GT_SCALE = False
    cfg.EVALUATORS = ("kitti_evaluator_0_30", "kitti_evaluator_30_50", "kitti_evaluator_50_80")
    cfg.DATASETS.TEST.PREPROCESS = []
    evaluators = DatasetEvaluators(build_evaluator(cfg, None))
    evaluators.reset()

    # gt split across bands along width (garg crop removes the top ~41% of
    # rows, so bands must be column slabs); pred wrong only in 30-50
    gt = np.concatenate([
        np.full((1, 100, 100), 10.0),
        np.full((1, 100, 100), 40.0),
        np.full((1, 100, 100), 70.0),
    ], axis=2).astype(np.float32)
    pred = gt.copy()
    pred[:, :, 100:200] *= 1.5
    evaluators.process(
        {"depth_orig": gt, "metadata": [{"idx": 0}]}, {"depth_pred": pred[..., None]}
    )
    res = evaluators.evaluate()
    assert res["kitti evaluator (0-30m)"]["abs_rel"] < 1e-6
    assert res["kitti evaluator (30-50m)"]["abs_rel"] > 0.4
    assert res["kitti evaluator (50-80m)"]["abs_rel"] < 1e-6


def test_evaluator_inverse_preprocess():
    """Evaluator applies the reversed test pipeline (un-resize) before
    metrics — the framework's one dependency inversion."""
    cfg = get_cfg()
    cfg.TEST.GT_SCALE = False
    cfg.EVALUATORS = ("kitti_evaluator",)
    cfg.DATASETS.TEST.PREPROCESS = [CfgNode({"NAME": "Resize", "IMG_W": 100, "IMG_H": 50})]
    (ev,) = build_evaluator(cfg, None)
    ev.reset()

    # gt is full-res; prediction is at the resized shape with resize metadata
    gt = np.full((1, 100, 200), 10.0, np.float32)
    pred = np.full((1, 50, 100, 1), 10.0, np.float32)
    metadata = {"h_before_resize": 100, "w_before_resize": 200}
    ev.process({"depth_orig": gt, "metadata": [metadata]}, {"depth_pred": pred})
    m = ev.evaluate()["kitti evaluator"]
    assert m["abs_rel"] < 1e-6


def test_depth_saver(tmp_path):
    cfg = get_cfg()
    cfg.TEST.GT_SCALE = False
    cfg.EVALUATORS = ("kitti_depth_saver",)
    cfg.DATASETS.TEST.PREPROCESS = []
    (saver,) = build_evaluator(cfg, str(tmp_path))
    pred = np.full((1, 20, 30, 1), 3.0, np.float32)
    saver.process(
        {"depth_orig": pred[..., 0], "metadata": [{"date": "d", "drive": "01", "img_id": "42"}]},
        {"depth_pred": pred},
    )
    saver.evaluate()
    import cv2

    saved = cv2.imread(str(tmp_path / "d_01_42.png"), -1)
    assert saved is not None
    np.testing.assert_allclose(saved.astype(np.float32) / 255.0, 3.0)
