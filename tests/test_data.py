"""Data pipeline tests: preprocess forward/inverse, samplers, loader, collation."""

import numpy as np
import pytest

from simpledepthestimation_tpu.config import CfgNode, get_cfg
from simpledepthestimation_tpu.data import (
    DATASET_REGISTRY,
    build_train_loader,
    build_test_loader,
)
from simpledepthestimation_tpu.data.preprocess import build_preprocess
from simpledepthestimation_tpu.data.samplers import (
    EpochSampler,
    TrainingSampler,
    InferenceSampler,
)


def _sample(H=100, W=200, with_depth=True):
    rng = np.random.RandomState(1)
    d = {
        "metadata": {},
        "img": rng.randint(0, 255, (H, W, 3), dtype=np.uint8),
        "intrinsics": np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]], np.float32),
    }
    if with_depth:
        depth = np.zeros((H, W), np.float32)
        depth[rng.rand(H, W) > 0.9] = rng.uniform(1, 80)
        d["depth"] = depth
    return d


def test_resize_forward_backward():
    op = build_preprocess(CfgNode({"NAME": "Resize", "IMG_W": 100, "IMG_H": 50}))
    d = _sample()
    K_orig = d["intrinsics"].copy()
    d = op.forward(d, np.random.default_rng(0))
    assert d["img"].shape == (50, 100, 3)
    assert d["depth"].shape == (50, 100)
    np.testing.assert_allclose(d["intrinsics"][0, 0], K_orig[0, 0] * 0.5)
    np.testing.assert_allclose(d["intrinsics"][1, 1], K_orig[1, 1] * 0.5)

    d["depth_pred"] = np.ones((50, 100), np.float32)
    d = op.backward(d)
    assert d["depth_pred"].shape == (100, 200)


def test_sparse_depth_resize_preserves_values():
    from simpledepthestimation_tpu.data.preprocess.augmentation import resize_depth_sparse

    depth = np.zeros((100, 200), np.float32)
    depth[10, 20] = 5.0
    depth[50, 100] = 42.0
    out = resize_depth_sparse(depth, (50, 100))
    assert out[5, 10] == 5.0
    assert out[25, 50] == 42.0
    # downscale does not interpolate: all values come from inputs
    assert set(np.unique(out)) <= {0.0, 5.0, 42.0}


def test_croptopto_and_backward():
    op = build_preprocess(CfgNode({"NAME": "CropTopTo", "IMG_H": 60}))
    d = _sample()
    cy_before = d["intrinsics"][1, 2]
    d = op.forward(d)
    assert d["img"].shape[0] == 60
    assert d["intrinsics"][1, 2] == cy_before - 40
    d["depth_pred"] = np.ones((60, 200), np.float32)
    d = op.backward(d)
    assert d["depth_pred"].shape == (100, 200)
    assert (d["depth_pred"][:40] == 0).all()


def test_kbcrop_inverse():
    op = build_preprocess(CfgNode({"NAME": "KBCrop"}))
    d = _sample(H=375, W=1242)
    d = op.forward(d)
    assert d["img"].shape[:2] == (352, 1216)
    d["depth_pred"] = np.full((352, 1216), 3.0, np.float32)
    d = op.backward(d)
    assert d["depth_pred"].shape == (375, 1242)


def test_random_crop_bounds_and_inverse():
    op = build_preprocess(CfgNode({"NAME": "RandomCrop", "IMG_W": 60, "IMG_H": 40}))
    for i in range(5):
        d = _sample()
        d = op.forward(d, np.random.default_rng(i))
        assert d["img"].shape[:2] == (40, 60)


def test_random_flip_is_flag_only():
    op = build_preprocess(CfgNode({"NAME": "RandomFlip"}))
    d = _sample()
    img_before = d["img"].copy()
    d = op.forward(d, np.random.default_rng(0))
    assert isinstance(d["flip"], bool)
    np.testing.assert_array_equal(d["img"], img_before)


def test_clip_depth():
    op = build_preprocess(CfgNode({"NAME": "ClipDepth", "MAX_DEPTH": 10}))
    d = _sample()
    d["depth"][:] = 50.0
    d = op.forward(d)
    assert d["depth"].max() <= 10.0


def test_random_image_aug_keeps_orig():
    op = build_preprocess(CfgNode({"NAME": "RandomImageAug"}))
    d = _sample()
    d["ctx_img"] = [d["img"].copy()]
    img_before = d["img"].copy()
    d = op.forward(d, np.random.default_rng(0))
    np.testing.assert_array_equal(d["img_orig"], img_before)
    assert d["img"].dtype == np.uint8
    # jitter actually changed the image (prob=1.0)
    assert not np.array_equal(d["img"], img_before)
    # identical jitter applied to context
    np.testing.assert_array_equal(d["img"], d["ctx_img"][0])


def test_color_jitter_semantics():
    """Analytic checks of the adjust_* definitions (torchvision semantics:
    blend-with-gray for contrast/saturation; torchvision itself is not in
    this image)."""
    from simpledepthestimation_tpu.data.preprocess.augmentation import (
        adjust_brightness,
        adjust_contrast,
        adjust_saturation,
        adjust_hue,
        _gray,
    )

    rng = np.random.RandomState(0)
    img = rng.rand(16, 24, 3).astype(np.float32) * 0.5  # headroom: no clipping

    np.testing.assert_allclose(adjust_brightness(img, 1.3), img * 1.3, atol=1e-6)

    # factor 0 → uniform gray mean (contrast) / per-pixel gray (saturation)
    c0 = adjust_contrast(img, 0.0)
    np.testing.assert_allclose(c0, np.full_like(img, _gray(img).mean()), atol=1e-6)
    s0 = adjust_saturation(img, 0.0)
    np.testing.assert_allclose(s0, np.repeat(_gray(img)[..., None], 3, -1), atol=1e-6)

    # factor 1 → identity
    np.testing.assert_allclose(adjust_contrast(img, 1.0), img, atol=1e-6)
    np.testing.assert_allclose(adjust_saturation(img, 1.0), img, atol=1e-6)
    np.testing.assert_allclose(adjust_hue(img, 0.0), img, atol=1e-5)
    # full-revolution hue shift → identity
    np.testing.assert_allclose(adjust_hue(img, 1.0), img, atol=1e-4)


def test_totensor_scales():
    op = build_preprocess(CfgNode({"NAME": "ToTensor"}))
    d = _sample()
    d = op.forward(d)
    assert d["img"].dtype == np.float32
    assert d["img"].max() <= 1.0


# ---------------------------------------------------------------------------
# samplers
# ---------------------------------------------------------------------------


def test_epoch_sampler_coverage_and_shuffling():
    all_indices = []
    for rank in range(4):
        s = EpochSampler(10, seed=7, rank=rank, world_size=4)
        s.set_epoch(0)
        all_indices.extend(list(s))
    # padded to 12, covers all 10 at least once
    assert len(all_indices) == 12
    assert set(all_indices) == set(range(10))

    s = EpochSampler(10, seed=7)
    s.set_epoch(0)
    e0 = list(s)
    s.set_epoch(1)
    e1 = list(s)
    assert e0 != e1 and sorted(e0) == sorted(e1)


def test_inference_sampler_exact_coverage():
    covered = []
    lens = []
    for rank in range(3):
        s = InferenceSampler(10, rank=rank, world_size=3)
        idxs = list(s)
        covered.extend(idxs)
        lens.append(len(idxs))
    assert sorted(covered) == list(range(10))  # no duplicates, no gaps
    assert sum(lens) == 10


def test_training_sampler_stream():
    import itertools

    s = TrainingSampler(5, seed=3, rank=1, world_size=2)
    stream = list(itertools.islice(iter(s), 10))
    assert len(stream) == 10
    assert all(0 <= i < 5 for i in stream)


# ---------------------------------------------------------------------------
# synthetic dataset end-to-end through loader
# ---------------------------------------------------------------------------


def _synthetic_cfg(num_ctx=2):
    cfg = get_cfg()
    cfg.DATASETS.TRAIN.NAME = "SyntheticDepth"
    cfg.DATASETS.TRAIN.LENGTH = 12
    cfg.DATASETS.TRAIN.IMG_HEIGHT = 64
    cfg.DATASETS.TRAIN.IMG_WIDTH = 96
    cfg.DATASETS.TRAIN.FORWARD_CONTEXT = num_ctx // 2
    cfg.DATASETS.TRAIN.BACKWARD_CONTEXT = num_ctx - num_ctx // 2
    cfg.DATASETS.TRAIN.PREPROCESS = [
        CfgNode({"NAME": "RandomFlip"}),
        CfgNode({"NAME": "RandomImageAug"}),
        CfgNode({"NAME": "ToTensor"}),
    ]
    cfg.DATASETS.TEST.NAME = "SyntheticDepth"
    cfg.DATASETS.TEST.LENGTH = 5
    cfg.DATASETS.TEST.IMG_HEIGHT = 64
    cfg.DATASETS.TEST.IMG_WIDTH = 96
    cfg.DATASETS.TEST.PREPROCESS = [CfgNode({"NAME": "ToTensor"})]
    cfg.SOLVER.IMS_PER_BATCH = 4
    cfg.DATALOADER.NUM_WORKERS = 2
    return cfg


def test_train_loader_batches():
    cfg = _synthetic_cfg()
    loader = build_train_loader(cfg, seed=0)
    batches = list(loader)
    assert len(batches) == 3  # 12 / 4
    b = batches[0]
    assert b["img"].shape == (4, 64, 96, 3)
    assert b["img_orig"].shape == (4, 64, 96, 3)
    assert b["ctx_img"].shape == (4, 2, 64, 96, 3)
    assert b["intrinsics"].shape == (4, 3, 3)
    assert b["flip"].shape == (4,)
    assert b["depth"].shape == (4, 64, 96, 1)
    assert b["img"].dtype == np.float32


def test_strict_parity_batch_level_flip():
    """PARITY.STRICT reproduces the reference collator semantics: the whole
    batch takes sample 0's flip flag (reference data/datasets/kitti_v2.py:219)
    instead of our per-sample flip vector."""
    cfg = _synthetic_cfg()
    cfg.PARITY.STRICT = True
    loader = build_train_loader(cfg, seed=0)
    saw_flip = saw_noflip = False
    for b in loader:
        flips = np.asarray(b["flip"])
        assert flips.dtype == bool and flips.shape == (4,)
        # batch-level: every sample carries the same flag
        assert np.all(flips == flips[0])
        saw_flip |= bool(flips[0])
        saw_noflip |= not bool(flips[0])

    # default mode on the same seed produces a per-sample (mixed) vector in
    # at least one batch
    cfg2 = _synthetic_cfg()
    loader2 = build_train_loader(cfg2, seed=0)
    mixed = any(
        (lambda f: f.any() and not f.all())(np.asarray(b["flip"])) for b in loader2
    )
    assert mixed, "expected a mixed per-sample flip vector in default mode"


def test_train_loader_deterministic():
    cfg = _synthetic_cfg()
    l1 = build_train_loader(cfg, seed=5)
    l2 = build_train_loader(cfg, seed=5)
    b1 = next(iter(l1))
    b2 = next(iter(l2))
    np.testing.assert_array_equal(b1["img"], b2["img"])
    np.testing.assert_array_equal(b1["flip"], b2["flip"])


def test_train_loader_epoch_reshuffle():
    cfg = _synthetic_cfg()
    loader = build_train_loader(cfg, seed=0)
    loader.set_epoch(0)
    ids0 = [d["metadata"][0]["idx"] for d in (b for b in loader)]
    loader.set_epoch(1)
    ids1 = [d["metadata"][0]["idx"] for d in (b for b in loader)]
    assert ids0 != ids1


def test_test_loader_batch1():
    cfg = _synthetic_cfg()
    loader = build_test_loader(cfg)
    batches = list(loader)
    assert len(batches) == 5
    assert batches[0]["img"].shape[0] == 1


def test_loader_early_break_no_thread_leak():
    """A consumer abandoning the iterator mid-epoch (PreciseBN takes N
    batches and breaks) must not leave the producer thread blocked on the
    full prefetch queue."""
    import gc
    import threading
    import time

    cfg = _synthetic_cfg()
    baseline = threading.active_count()
    for _ in range(3):
        loader = build_train_loader(cfg, seed=0)
        it = iter(loader)
        next(it)
        it.close()  # GeneratorExit → stop event → producer unblocks
    gc.collect()
    deadline = time.time() + 5.0
    while threading.active_count() > baseline and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= baseline
