"""Eval-protocol parity vs the reference's own evaluator code.

Feeds IDENTICAL (depth_pred, depth_orig gt, metadata) through our
``evaluation.depth_evaluation`` evaluators and the reference's
(reference detectron2/evaluation/depth_evaluation.py:54-162, importable
numpy at world 1) and asserts every reported metric equal to float
precision — closing the metric-definition risk for:

- the 9-metric suite (compute_errors :30-51) incl. the garg crop (:16-20),
- valid-mask bounds + the median gt-scaling branch (:85-102, TEST.GT_SCALE),
- the 0-30/30-50/50-80 m banded variants (:134-162),
- the inverse-preprocess (postprocess.backward) path on Resize-only and
  KBCrop+Resize test pipelines (evaluator.py:39-43, augmentation.py:67-75
  KBCrop.backward / :165-168 Resize.backward).
"""

import numpy as np
import pytest

from reference_compat import install_reference_environment, nested

install_reference_environment()

from simpledepthestimation_tpu.config import CfgNode, get_cfg
from simpledepthestimation_tpu.evaluation import depth_evaluation as ours_mod

from detectron2.evaluation import depth_evaluation as ref_mod

EVALUATORS = [
    "kitti_evaluator",
    "kitti_evaluator_0_30",
    "kitti_evaluator_30_50",
    "kitti_evaluator_50_80",
]


def _make_samples(rng, n, hw_gt, hw_pred):
    """Synthetic (gt, pred) pairs exercising every protocol branch: sparse
    gt (zeros = invalid), values spanning past the 80 m cap, preds with a
    global scale offset (so GT_SCALE's median branch changes the answer)."""
    H, W = hw_gt
    h, w = hw_pred
    gts, preds = [], []
    for _ in range(n):
        gt = rng.uniform(0.5, 90.0, (H, W)).astype(np.float32)
        gt[rng.rand(H, W) < 0.6] = 0.0  # sparse lidar-style invalids
        pred = (rng.uniform(1.0, 70.0, (h, w)) * 1.3).astype(np.float32)
        gts.append(gt)
        preds.append(pred)
    return gts, preds


def _ref_cfg(preprocess_dicts, gt_scale):
    return nested(
        {
            "DATASETS": {"TEST": {"PREPROCESS": [dict(p) for p in preprocess_dicts]}},
            "TEST": {"GT_SCALE": gt_scale},
        }
    )


def _our_cfg(preprocess_dicts, gt_scale):
    cfg = get_cfg()
    cfg.DATASETS.TEST.PREPROCESS = [CfgNode(dict(p)) for p in preprocess_dicts]
    cfg.TEST.GT_SCALE = gt_scale
    return cfg


def _run_pair(evaluator_name, preprocess_dicts, gt_scale, gts, preds, metadatas,
              tmp_path, batches=2):
    ref_ev = ref_mod.__dict__[evaluator_name](
        _ref_cfg(preprocess_dicts, gt_scale), str(tmp_path / "ref")
    )
    our_ev = ours_mod.__dict__[evaluator_name](
        _our_cfg(preprocess_dicts, gt_scale), str(tmp_path / "ours")
    )
    ref_ev.reset()
    our_ev.reset()
    # feed in a few batches to exercise accumulation across process() calls
    chunks = np.array_split(np.arange(len(gts)), batches)
    for idx in chunks:
        inputs = {
            "depth_orig": [gts[i] for i in idx],
            "metadata": [dict(metadatas[i]) for i in idx],
        }
        outputs = {"depth_pred": np.stack([preds[i] for i in idx])}
        # the reference mutates metadata dicts in backward; give each its own
        ref_ev.process(
            {
                "depth_orig": [gts[i] for i in idx],
                "metadata": [dict(metadatas[i]) for i in idx],
            },
            {"depth_pred": np.stack([preds[i] for i in idx])},
        )
        our_ev.process(inputs, outputs)
    ref_res = ref_ev.evaluate()
    our_res = our_ev.evaluate()
    return ref_res, our_res


def _assert_results_equal(ref_res, our_res):
    assert set(ref_res.keys()) == set(our_res.keys()), (ref_res, our_res)
    for tag in ref_res:
        for k, v in ref_res[tag].items():
            assert k in our_res[tag], (tag, k)
            np.testing.assert_allclose(
                our_res[tag][k], v, rtol=1e-9, atol=0,
                err_msg=f"{tag}/{k}",
            )


@pytest.mark.parametrize("gt_scale", [False, True])
@pytest.mark.parametrize("evaluator_name", EVALUATORS)
def test_metric_chain_parity(evaluator_name, gt_scale, tmp_path):
    """No-postprocess configs: isolates compute_errors + crop + masks +
    median-scaling + band aggregation."""
    rng = np.random.RandomState(11)
    gts, preds = _make_samples(rng, n=6, hw_gt=(96, 320), hw_pred=(96, 320))
    metadatas = [{} for _ in gts]
    ref_res, our_res = _run_pair(
        evaluator_name, [], gt_scale, gts, preds, metadatas, tmp_path
    )
    # both must actually produce rows (empty dict == no valid predictions)
    if evaluator_name == "kitti_evaluator":
        assert ref_res and our_res
    _assert_results_equal(ref_res, our_res)


def test_resized_pipeline_parity(tmp_path):
    """Resize test pipeline: predictions at network size are un-resized
    (INTER_NEAREST) to the original frame before crop/metrics — the
    MonoDepth2/MotionLearning eval configs' shape."""
    rng = np.random.RandomState(13)
    H, W, h, w = 190, 310, 64, 96
    gts, preds = _make_samples(rng, n=4, hw_gt=(H, W), hw_pred=(h, w))
    metadatas = [{"h_before_resize": H, "w_before_resize": W} for _ in gts]
    pre = [
        {"NAME": "LoadImg"},
        {"NAME": "Resize", "IMG_W": w, "IMG_H": h},
        {"NAME": "ToTensor"},
    ]
    ref_res, our_res = _run_pair(
        "kitti_evaluator", pre, True, gts, preds, metadatas, tmp_path
    )
    assert ref_res and our_res
    _assert_results_equal(ref_res, our_res)


def test_kbcrop_pipeline_parity(tmp_path):
    """KBCrop(+Resize) test pipeline: the supervised (BTS) eval shape —
    un-resize to the 352×1216 crop, then zero-pad back into the original
    frame; metrics over the full original-frame gt."""
    rng = np.random.RandomState(17)
    H, W = 400, 1400  # original frame (≥ the fixed 1216×352 KB window)
    h, w = 64, 96
    y0, x0 = H - 352, int((W - 1216) / 2)
    gts, preds = _make_samples(rng, n=3, hw_gt=(H, W), hw_pred=(h, w))
    metadatas = [
        {
            "kb_y_start": y0,
            "kb_x_start": x0,
            "h_before_kb_crop": H,
            "w_before_kb_crop": W,
            "h_before_resize": 352,
            "w_before_resize": 1216,
        }
        for _ in gts
    ]
    pre = [
        {"NAME": "LoadImg"},
        {"NAME": "KBCrop"},
        {"NAME": "Resize", "IMG_W": w, "IMG_H": h},
        {"NAME": "ToTensor"},
    ]
    for gt_scale in (False, True):
        ref_res, our_res = _run_pair(
            "kitti_evaluator", pre, gt_scale, gts, preds, metadatas, tmp_path
        )
        assert ref_res and our_res
        _assert_results_equal(ref_res, our_res)


def test_compute_errors_parity():
    """Direct function-level check of all NINE metrics (the evaluator only
    reports 7; silog/log10 are reference compute_errors :45-49)."""
    rng = np.random.RandomState(19)
    gt = rng.uniform(1.0, 80.0, (5000,)).astype(np.float64)
    pred = rng.uniform(0.5, 90.0, (5000,)).astype(np.float64)
    ours = np.asarray(ours_mod.compute_errors(gt, pred), np.float64)
    theirs = np.asarray(ref_mod.compute_errors(gt, pred), np.float64)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12)
