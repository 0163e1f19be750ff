"""Full-model GRADIENT parity vs the reference's own PyTorch autograd.

Round-2 forward/loss parity (tests/test_reference_parity.py) proves the
models compute the same function; this file proves they *train* the same:
d(total_loss)/d(params) from `jax.grad` must equal torch autograd's
gradients mapped through the same weight converters.

Why the mapping is valid: every converter in ``models/torch_import.py`` is
a pure layout permutation (transpose/reshape/copy — see
convert_packnet's docstring and the module audit), so the gradient of the
loss w.r.t. a converted parameter is the identically-converted gradient of
the loss w.r.t. the torch parameter. Running-stat buffers carry no
gradient and are set to zero on the torch side; they land in
``batch_stats`` which the comparison ignores.

Covers the backward pass of every family the forward harness covers:
- MonoDepth2Model total loss (DepthResNet-18 + PoseNet + warp/SSIM chain),
  reference detectron2/modeling/meta_arch/MonoDepth2.py:55-125;
- MotionLearningModel total loss (GoogleResNet + GoogleMotionNet + motion
  losses), reference meta_arch/MotionLearning.py:70-246;
- supervised silog through BtsModel-R50 (BTSNet.py:336-370) and
  PackNet01-1A (PackNet01.py:120-209), reference meta_arch/Supervised.py:36-48.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_compat import install_reference_environment, nested

install_reference_environment()

from simpledepthestimation_tpu.config import get_cfg
from simpledepthestimation_tpu.models import build_model
from simpledepthestimation_tpu.models import torch_import as TI

B, H, W = 2, 64, 96


def sd_np(module) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def grad_sd(ref) -> dict:
    """Torch gradients laid out as a state_dict (zeros for buffers /
    unused params) so the standard weight converters can map them."""
    params = dict(ref.named_parameters())
    out = {}
    for k, v in ref.state_dict().items():
        p = params.get(k)
        if p is not None and p.grad is not None:
            out[k] = p.grad.detach().cpu().numpy()
        else:
            out[k] = np.zeros(v.shape, np.float32)
    return out


def _collect_leaves(mine, theirs, out, path=""):
    if hasattr(theirs, "items"):
        assert set(mine.keys()) == set(theirs.keys()), (path, set(mine), set(theirs))
        for k in theirs:
            _collect_leaves(mine[k], theirs[k], out, f"{path}/{k}")
        return
    out.append((path, np.asarray(mine, np.float64), np.asarray(theirs, np.float64)))


def assert_grad_trees_close(
    mine,
    theirs,
    rtol=2e-3,
    atol=1e-6,
    min_cos=1 - 1e-6,
    max_rel_l2=1e-3,
    max_median_rel=1e-3,
):
    """Two-level check, thresholds calibrated per test against the measured
    cross-framework noise floor (diagnosed leaf-by-leaf; see each call site):

    1. Per-leaf ``‖a−b‖∞ ≤ rtol·‖b‖∞ + atol``. The floor is NOT pure fp
       rounding: (a) losses with data-dependent branches (per-pixel min
       reduce, automask, mask_motion's mag>mean indicator) flip branches at
       pixels where the frameworks' forward values differ at ~1e-7, each
       flip moving a few gradient entries by ~1% of the leaf scale; (b) deep
       backward chains (BTS-R50) amplify accumulation-order noise toward the
       early layers. The atol floor covers mathematically-zero gradients
       (e.g. a conv bias feeding directly into GroupNorm). Element-wise
       rtol would be wrong: near-zero elements of a healthy leaf carry
       O(leaf-scale) noise.
    2. Global direction + magnitude over the flattened gradient (cosine,
       rel-L2). Branch flips and noise barely move these; any real
       wiring/conversion bug (a swapped layer, a wrong transpose) collapses
       the cosine outright.
    """
    leaves = []
    _collect_leaves(mine, theirs, leaves)
    rel_errs = []
    for path, a, b in leaves:
        err = float(np.abs(a - b).max()) if a.size else 0.0
        maxg = float(np.abs(b).max())
        rel_errs.append(err / max(maxg, 1e-12))
        if rtol is None:
            continue  # cancellation-noisy nets: the global checks below
        bound = rtol * maxg + atol
        assert err <= bound, (
            f"{path}: max|Δgrad| {err:.3e} > {bound:.3e} (‖grad‖∞={maxg:.3e})"
        )
    # median per-leaf relative error: a systematic conversion/wiring bug
    # shifts MOST leaves, not the cancellation-dominated tail
    median_rel = float(np.median(rel_errs))
    assert median_rel <= max_median_rel, f"median per-leaf rel error {median_rel}"
    va = np.concatenate([a.ravel() for _, a, _ in leaves])
    vb = np.concatenate([b.ravel() for _, _, b in leaves])
    denom = float(np.linalg.norm(va) * np.linalg.norm(vb))
    cos = float(va @ vb) / max(denom, 1e-30)
    rel_l2 = float(np.linalg.norm(va - vb)) / max(float(np.linalg.norm(vb)), 1e-30)
    assert cos >= min_cos, f"global gradient cosine {cos}"
    assert rel_l2 <= max_rel_l2, f"global gradient rel-L2 {rel_l2}"


def jax_loss_grads(model, variables, batch, loss_filter=None):
    """d(sum of loss terms)/d(params) with batch_stats held fixed."""
    nonparam = {k: v for k, v in variables.items() if k != "params"}

    def total(params):
        losses, _ = model.apply(
            {"params": params, **nonparam},
            batch,
            train=True,
            mutable=["batch_stats"],
            rngs={"noise": jax.random.PRNGKey(2)},
        )
        terms = [
            v for k, v in losses.items() if loss_filter is None or loss_filter(k)
        ]
        return sum(jnp.asarray(v, jnp.float32) for v in terms)

    return jax.grad(total)(variables["params"])


def convert_grads(variables, ref, cfg):
    """Map the torch gradient state_dict through the weight converters."""
    gvars = TI.apply_torch_checkpoint(variables, grad_sd(ref), cfg)
    return gvars["params"]


def trainable_mask(variables, ref, cfg):
    """1/0 tree marking params the reference actually trains. BtsModel
    construction freezes the encoder stem conv + every encoder BN affine
    via set_misc (reference BTSNet.py:382-412, requires_grad=False), so
    torch autograd computes no gradient there — those leaves are excluded
    from the comparison (our solver zeroes their updates instead; see
    solver/build.py freeze_substrings_from_cfg)."""
    params = dict(ref.named_parameters())
    mask_sd = {}
    for k, v in ref.state_dict().items():
        p = params.get(k)
        on = p is not None and p.requires_grad
        mask_sd[k] = np.full(tuple(v.shape), 1.0 if on else 0.0, np.float32)
    mvars = TI.apply_torch_checkpoint(variables, mask_sd, cfg)
    return mvars["params"]


def mask_grads(grads, mask):
    return jax.tree_util.tree_map(lambda g, m: g * m, grads, mask)


# ---------------------------------------------------------------------------
# MonoDepth2Model
# ---------------------------------------------------------------------------


def test_monodepth2_grad_parity():
    from detectron2.modeling.meta_arch.MonoDepth2 import MonoDepth2Model as RefM2

    loss_keys = {
        "SSIM_WEIGHT": 0.85,
        "C1": 1e-4,
        "C2": 9e-4,
        "CLIP": 0.0,
        "AUTOMASK": True,
        "PHOTOMETRIC_REDUCE": "min",
        "SMOOTHNESS_WEIGHT": 0.001,
        "SUPERVISED_WEIGHT": 0.0,
        "VAR_LOSS_WEIGHT": 0.0,
        "VARIANCE_FOCUS": 0.85,
    }
    rcfg = nested(
        {
            "MODEL": {
                "META_ARCHITECTURE": "MonoDepth2Model",
                "DEPTH_NET": {
                    "NAME": "DepthResNet",
                    "ENCODER_NAME": "18",
                    "UPSAMPLE_DEPTH": False,
                },
                "POSE_NET": {"NAME": "PoseNet", "NUM_CONTEXTS": 2},
                "MAX_DEPTH": 80.0,
                "PIXEL_MEAN": [0.485, 0.456, 0.406],
                "PIXEL_STD": [0.229, 0.224, 0.225],
            },
            "LOSS": dict(loss_keys),
        }
    )
    torch.manual_seed(41)
    ref = RefM2(rcfg).train()

    # Same dense-t workaround as the loss-parity test: the reference-HEAD
    # rigid-t path degenerates (see test_reference_parity.py), so expand t
    # to the dense shape (identical math, differentiable the same way).
    orig_rcl = ref.rgb_consistency_loss

    def rcl_dense_t(frame_A, frame_B, depth_A, intrinsics, R=None, t=None):
        if t is not None:
            h, w = depth_A.shape[-2:]
            t = t.expand(-1, -1, h, w)
        return orig_rcl(frame_A, frame_B, depth_A, intrinsics, R, t)

    ref.rgb_consistency_loss = rcl_dense_t

    rng = np.random.RandomState(43)
    img = rng.rand(B, H, W, 3).astype(np.float32)
    ctx = rng.rand(B, 2, H, W, 3).astype(np.float32)
    img_orig = rng.rand(B, H, W, 3).astype(np.float32)
    ctx_orig = rng.rand(B, 2, H, W, 3).astype(np.float32)
    K = np.tile(
        np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]], np.float32),
        (B, 1, 1),
    )

    ref_batch = {
        "img": nchw(img),
        "ctx_img": [nchw(ctx[:, j]) for j in range(2)],
        "img_orig": nchw(img_orig),
        "ctx_img_orig": [nchw(ctx_orig[:, j]) for j in range(2)],
        "intrinsics": torch.from_numpy(K.copy()),
    }
    ref_total = sum(ref(ref_batch).values())
    ref_total.backward()

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "MonoDepth2Model"
    cfg.MODEL.DEPTH_NET.NAME = "DepthResNet"
    cfg.MODEL.DEPTH_NET.ENCODER_NAME = "18"
    cfg.MODEL.POSE_NET.NAME = "PoseNet"
    cfg.MODEL.POSE_NET.NUM_CONTEXTS = 2
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.PALLAS_PHOTOMETRIC = False
    for k, v in loss_keys.items():
        cfg.LOSS[k] = v

    model = build_model(cfg)
    batch = {
        "img": jnp.asarray(img),
        "ctx_img": jnp.asarray(ctx),
        "img_orig": jnp.asarray(img_orig),
        "ctx_img_orig": jnp.asarray(ctx_orig),
        "intrinsics": jnp.asarray(K),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        batch,
        train=True,
    )
    variables = TI.apply_torch_checkpoint(variables, sd_np(ref), cfg)

    grads = mask_grads(
        jax_loss_grads(model, variables, batch), trainable_mask(variables, ref, cfg)
    )
    want = convert_grads(variables, ref, cfg)
    # branchy loss (min-reduce/automask): per-leaf floor 3e-2; measured
    # global floor: 1-cos 8.8e-6, so direction bound 1e-4
    assert_grad_trees_close(grads, want, rtol=3e-2, min_cos=1 - 1e-4, max_rel_l2=5e-3)


# ---------------------------------------------------------------------------
# MotionLearningModel
# ---------------------------------------------------------------------------


def test_motionlearning_grad_parity():
    from detectron2.modeling.meta_arch.MotionLearning import (
        MotionLearningModel as RefML,
    )

    loss_keys = {
        "NUM_SCALES": 2,
        "DEPTH_L1_WEIGHT": 0.0,
        "SSIM_WEIGHT": 3.0,
        "C1": float("inf"),
        "C2": 9e-6,
        "CLIP": 0.0,
        "SMOOTHNESS_WEIGHT": 0.001,
        "SUPERVISED_WEIGHT": 0.0,
        "VARIANCE_FOCUS": 0.85,
        "VAR_LOSS_WEIGHT": 0.0,
        "MOTION_SMOOTHNESS_WEIGHT": 1.0,
        "MOTION_SPARSITY_WEIGHT": 0.2,
        "ROT_CYCLE_WEIGHT": 1e-3,
        "TRANS_CYCLE_WEIGHT": 5e-2,
        "SCALE_NORMALIZE": True,
    }
    rcfg = nested(
        {
            "MODEL": {
                "META_ARCHITECTURE": "MotionLearningModel",
                "DEPTH_NET": {
                    "NAME": "GoogleResNet",
                    "ENCODER_NAME": "18",
                    "NORM": "BN",
                    "LEARN_SCALE": False,
                    "UPSAMPLE_DEPTH": False,
                },
                "POSE_NET": {
                    "NAME": "GoogleMotionNet",
                    "USE_DEPTH": True,
                    "LEARN_SCALE": True,
                    "GROUP_NORM": True,
                    "SCALE_CONSTRAIN": "clip",
                    "MASK_MOTION": True,
                },
                "MAX_DEPTH": 80.0,
                "PIXEL_MEAN": [0.485, 0.456, 0.406],
                "PIXEL_STD": [0.229, 0.224, 0.225],
                "WITH_MASK": False,
                "RETURN_LOSS": False,
            },
            "LOSS": dict(loss_keys),
        }
    )
    torch.manual_seed(47)
    ref = RefML(rcfg).train()

    rng = np.random.RandomState(53)
    img = rng.rand(B, H, W, 3).astype(np.float32)
    ctx = rng.rand(B, 1, H, W, 3).astype(np.float32)
    K = np.tile(
        np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]], np.float32),
        (B, 1, 1),
    )
    ref_batch = {
        "img": nchw(img),
        "ctx_img": [nchw(ctx[:, 0])],
        "intrinsics": torch.from_numpy(K.copy()),
    }
    out = ref(ref_batch)
    ref_terms = [
        v
        for k, v in out.items()
        if isinstance(k, str) and k.endswith("loss") and torch.is_tensor(v) and v.ndim == 0
    ]
    sum(ref_terms).backward()

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "MotionLearningModel"
    cfg.MODEL.DEPTH_NET.NAME = "GoogleResNet"
    cfg.MODEL.DEPTH_NET.ENCODER_NAME = "18"
    cfg.MODEL.DEPTH_NET.NORM = "BN"
    cfg.MODEL.DEPTH_NET.LEARN_SCALE = False
    cfg.MODEL.POSE_NET.NAME = "GoogleMotionNet"
    cfg.MODEL.POSE_NET.USE_DEPTH = True
    cfg.MODEL.POSE_NET.LEARN_SCALE = True
    cfg.MODEL.POSE_NET.GROUP_NORM = True
    cfg.MODEL.POSE_NET.SCALE_CONSTRAIN = "clip"
    cfg.MODEL.POSE_NET.MASK_MOTION = True
    cfg.TPU.COMPUTE_DTYPE = "float32"
    for k, v in loss_keys.items():
        cfg.LOSS[k] = v

    model = build_model(cfg)
    batch = {
        "img": jnp.asarray(img),
        "ctx_img": jnp.asarray(ctx),
        "intrinsics": jnp.asarray(K),
        "motion_weight": jnp.float32(1.0),
        "noise_stddev": jnp.float32(0.0),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        batch,
        train=True,
    )
    variables = TI.apply_torch_checkpoint(variables, sd_np(ref), cfg)

    grads = mask_grads(
        jax_loss_grads(model, variables, batch), trainable_mask(variables, ref, cfg)
    )
    want = convert_grads(variables, ref, cfg)
    # branchy loss (occlusion masks, mask_motion indicator): per-leaf floor
    # 3e-2; measured global rel-L2 1.14e-3 -> bound 5e-3; measured median
    # per-leaf rel 1.07e-3 (GroupNorm-heavy refiners) -> bound 3e-3
    assert_grad_trees_close(
        grads, want, rtol=3e-2, min_cos=1 - 1e-4, max_rel_l2=5e-3, max_median_rel=3e-3
    )


# ---------------------------------------------------------------------------
# Supervised silog through BTS / PackNet (backward coverage of their
# custom decoders: LPG planes, packed 3D convs)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name,encoder,extra",
    [
        ("BtsModel", "resnet50_bts", {}),
        ("PackNet01", "18", {"VERSION": "1A"}),
    ],
)
def test_supervised_grad_parity(name, encoder, extra):
    from detectron2.modeling.meta_arch.Supervised import SupDepthModel as RefSup

    rcfg = nested(
        {
            "MODEL": {
                "META_ARCHITECTURE": "SupDepthModel",
                "DEPTH_NET": {
                    "NAME": name,
                    "ENCODER_NAME": encoder,
                    "UPSAMPLE_DEPTH": False,
                    "VERSION": extra.get("VERSION", "1A"),
                    "NORM": "BN",
                    "LEARN_SCALE": False,
                    "BTS_SIZE": 512,
                    "BN_NO_TRACK": False,
                    "FIX_1ST_CONV": False,
                    "FIX_1ST_CONVS": False,
                },
                "MAX_DEPTH": 80.0,
                "DATASET": "kitti",
                "PIXEL_MEAN": [0.485, 0.456, 0.406],
                "PIXEL_STD": [0.229, 0.224, 0.225],
            },
            "LOSS": {"VARIANCE_FOCUS": 0.85},
        }
    )
    torch.manual_seed(71)
    ref = RefSup(rcfg).train()

    rng = np.random.RandomState(73)
    img = rng.rand(B, H, W, 3).astype(np.float32)
    # gt in (2, 80) with a sprinkle of invalid (<1) pixels to exercise the
    # silog mask's gradient gating (reference losses.py:11 masks gt > 1)
    depth = (rng.rand(B, H, W, 1).astype(np.float32) * 78.0 + 2.0)
    depth[rng.rand(B, H, W, 1) < 0.1] = 0.0
    K = np.tile(
        np.array([[721.5, 0, W / 2], [0, 721.5, H / 2], [0, 0, 1]], np.float32),
        (B, 1, 1),
    )

    ref_batch = {
        "img": nchw(img),
        "depth": nchw(depth),
        "intrinsics": torch.from_numpy(K.copy()),
    }
    out = ref(ref_batch)
    out["silog_loss"].backward()

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "SupDepthModel"
    cfg.MODEL.DEPTH_NET.NAME = name
    cfg.MODEL.DEPTH_NET.ENCODER_NAME = encoder
    cfg.MODEL.DEPTH_NET.UPSAMPLE_DEPTH = False
    cfg.MODEL.MAX_DEPTH = 80.0
    cfg.TPU.COMPUTE_DTYPE = "float32"
    for k, v in extra.items():
        cfg.MODEL.DEPTH_NET[k] = v

    model = build_model(cfg)
    batch = {
        "img": jnp.asarray(img),
        "depth": jnp.asarray(depth),
        "intrinsics": jnp.asarray(K),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        batch,
        train=True,
    )
    variables = TI.apply_torch_checkpoint(variables, sd_np(ref), cfg)

    grads = mask_grads(
        jax_loss_grads(model, variables, batch), trainable_mask(variables, ref, cfg)
    )
    want = convert_grads(variables, ref, cfg)
    if name == "BtsModel":
        # BTS-R50's f32 backward is cancellation-noisy: torch disagrees
        # with ITSELF at up to 15% per-leaf inf-norm (median 1%) when only
        # the memory layout / thread count changes, on the same daspp /
        # mid-encoder leaf families. Per-leaf maxima are therefore
        # meaningless here; assert global direction+magnitude (measured:
        # cos 0.99968, rel-L2 2.5e-2) and the per-leaf MEDIAN (measured
        # 1.2e-4 — 80x tighter than torch's own layout self-noise), which a
        # systematic conversion bug would shift wholesale.
        assert_grad_trees_close(
            grads, want, rtol=None, min_cos=0.999, max_rel_l2=5e-2
        )
    else:
        assert_grad_trees_close(grads, want)
