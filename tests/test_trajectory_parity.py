"""N-step training-TRAJECTORY parity vs the reference's own torch loop.

Per-step parity is proven elsewhere (forward/loss: test_reference_parity,
gradients: test_reference_grad_parity, optimizer updates:
test_solver_parity).  This file composes all of it through the REAL
training loop: a fabricated on-disk KITTI tree feeds our actual runtime
(``engine.runtime.do_train`` — real loader order, epoch boundaries,
flip/jitter RNG, schedule application point, SPMD step over the 8-device
mesh), the consumed batch stream is captured via ``batch_tap`` and replayed
step-for-step through the reference's torch loop (reference
projects/MonoDepth2/train.py:79-119, projects/Supervised/train.py:99-135)
from an identical converted init, and the per-step total-loss sequences +
final weight trees must agree within a calibrated cross-framework noise
floor.

Compounding over N optimizer steps exposes backward/update errors below the
single-step gradient-parity floor (notably for BTS-R50, whose per-leaf
single-step criteria are necessarily loose — see
test_reference_grad_parity.py).

The identical-batch-stream methodology: the reference trains under torch
DataLoader RNG, so there is no canonical sample order to match — what must
match is the training math across the loop.  PARITY.STRICT restores the
reference's batch-level flip-from-sample-0 (kitti_v2.py:219) so the stream
is replayable exactly; the jittered/original image pairs and flip flags are
data, captured in the stream itself.
"""

import numpy as np
import pytest
import torch

import jax

from reference_compat import install_reference_environment, nested

install_reference_environment()

from simpledepthestimation_tpu.config import CfgNode, get_cfg
from simpledepthestimation_tpu.data import build_train_loader
from simpledepthestimation_tpu.engine.checkpoint import Checkpointer
from simpledepthestimation_tpu.engine.runtime import do_train
from simpledepthestimation_tpu.models import build_model
from simpledepthestimation_tpu.models import torch_import as TI
from simpledepthestimation_tpu.parallel import create_train_state
from simpledepthestimation_tpu.solver import build_optimizer

from test_kitti_e2e import _make_kitti

H_IMG, W_IMG = 96, 128  # fabricated tree frame size
H, W = 64, 96  # training size after Resize


def sd_np(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def nchw(x):
    return torch.from_numpy(np.ascontiguousarray(np.asarray(x).transpose(0, 3, 1, 2)))


def to_torch_batch(b):
    """Captured host batch (our collator layout) → the reference collator's
    layout (kitti_v2.py:196-221): NCHW stacks, ctx as list-of-tensors,
    batch-level flip bool from sample 0."""
    out = {}
    for k, v in b.items():
        if k in ("img", "img_orig", "depth"):
            out[k] = nchw(v)
        elif k in ("ctx_img", "ctx_img_orig"):
            v = np.asarray(v)
            out[k] = [nchw(v[:, j]) for j in range(v.shape[1])]
        elif k in ("intrinsics", "pose_gt"):
            out[k] = torch.from_numpy(np.asarray(v).copy())
        elif k == "flip":
            flip = np.asarray(v).ravel()
            # PARITY.STRICT guarantees batch-level flip; a mixed batch here
            # means the strict collator regressed
            assert flip.size == 0 or (flip == flip[0]).all(), flip
            out[k] = bool(flip[0]) if flip.size else False
    return out


def base_cfg(root, split, weights_dir, out_dir, supervised):
    cfg = get_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.PALLAS_PHOTOMETRIC = False
    cfg.PARITY.STRICT = True
    cfg.MODEL.WEIGHTS = weights_dir
    cfg.OUTPUT_DIR = out_dir
    cfg.SEED = 0
    cfg.LOG_PERIOD = 1
    cfg.TEST.EVAL_PERIOD = 0
    cfg.SOLVER.CHECKPOINT_PERIOD = 100  # no mid-run checkpoints

    train = cfg.DATASETS.TRAIN
    train.NAME = "KittiDepthV2"
    train.DATA_ROOT = root + "/raw"
    train.SPLIT = split
    if supervised:
        train.DEPTH_ROOT = root + "/refined"
        train.DEPTH_TYPE = "refined"
        train.FORWARD_CONTEXT = 0
        train.BACKWARD_CONTEXT = 0
        train.PREPROCESS = [
            CfgNode({"NAME": "LoadImg"}),
            CfgNode({"NAME": "LoadDepth"}),
            CfgNode({"NAME": "Resize", "IMG_W": W, "IMG_H": H}),
            CfgNode({"NAME": "RandomFlip"}),
            CfgNode({"NAME": "ToTensor"}),
        ]
    else:
        train.DEPTH_ROOT = ""
        train.DEPTH_TYPE = "none"
        train.FORWARD_CONTEXT = 1
        train.BACKWARD_CONTEXT = 1
        train.STRIDE = 1
        train.PREPROCESS = [
            CfgNode({"NAME": "LoadImg", "WITH_CTX": True}),
            CfgNode({"NAME": "Resize", "IMG_W": W, "IMG_H": H}),
            CfgNode({"NAME": "RandomFlip"}),
            CfgNode({"NAME": "RandomImageAug"}),
            CfgNode({"NAME": "ToTensor"}),
        ]
    cfg.DATASETS.TEST.NAME = ""
    cfg.DATALOADER.NUM_WORKERS = 0
    return cfg


def run_ours(cfg, ref_module, extra_batch_fn=None):
    """Seed our init from the torch module's converted weights, drive the
    real do_train, capture the consumed batch stream + per-step losses.
    ``run_ours.last_metrics`` keeps the full per-step metric dicts (the ML
    trajectory test reads ``grad_norm`` to prove the clip fired)."""
    model = build_model(cfg)
    loader = build_train_loader(cfg, seed=0)
    sample = {k: v for k, v in next(iter(loader)).items() if hasattr(v, "shape")}
    optimizer, _ = build_optimizer(cfg, steps_per_epoch=len(loader))
    state = create_train_state(model, optimizer, sample, jax.random.PRNGKey(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    variables = TI.apply_torch_checkpoint(variables, sd_np(ref_module), cfg)
    state = state.replace(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", state.batch_stats),
    )
    Checkpointer(cfg.MODEL.WEIGHTS).save(0, state)

    batches, metrics = [], []
    final = do_train(
        cfg,
        resume=False,
        extra_batch_fn=extra_batch_fn,
        batch_tap=batches.append,
        metrics_tap=lambda it, m: metrics.append(dict(m)),
    )
    run_ours.last_metrics = metrics
    return batches, [m["total_loss"] for m in metrics], final, len(loader)


def replay_torch(ref, batches, steps_per_epoch, make_opt_and_step, dtype=None,
                 before_step=None, post_backward=None):
    """Drive the reference loop over the captured stream: forward → sum of
    loss terms → backward → optimizer/schedule step; scheduler stepped at
    epoch boundaries exactly as the reference loop does.  ``dtype`` casts the
    float inputs (float64 makes the replay a noise-floor oracle).
    ``before_step(i, ref)`` applies pre-forward module mutation (the
    MotionLearning stddev/burn-in schedules); ``post_backward(i, ref)``
    runs between backward and opt.step (grad-norm clipping)."""
    opt, after_step = make_opt_and_step(ref)
    losses = []
    for i, b in enumerate(batches):
        if before_step is not None:
            before_step(i, ref)
        tb = to_torch_batch(b)
        if dtype is not None:
            tb = {
                k: (
                    [x.to(dtype) for x in v]
                    if isinstance(v, list)
                    else v.to(dtype)
                    if torch.is_tensor(v) and v.is_floating_point()
                    else v
                )
                for k, v in tb.items()
            }
        out = ref(tb)
        loss_dict = {k: v for k, v in out.items() if "loss" in k}
        total = sum(loss_dict.values())
        assert torch.isfinite(total).all(), loss_dict
        losses.append(float(total.detach()))
        opt.zero_grad()
        total.backward()
        if post_backward is not None:
            post_backward(i, ref)
        opt.step()
        after_step(i, (i + 1) % steps_per_epoch == 0)
    return losses


def assert_trajectories_match(
    ours, theirs, final_params, ref, cfg, variables_template,
    loss_rtol, min_cos, max_rel_l2,
):
    ours, theirs = np.asarray(ours), np.asarray(theirs)
    assert ours.shape == theirs.shape, (ours.shape, theirs.shape)
    rel = np.abs(ours - theirs) / np.maximum(np.abs(theirs), 1e-8)
    assert (rel <= loss_rtol).all(), (
        f"per-step loss rel errors {rel} exceed {loss_rtol}\n"
        f"ours:   {ours}\ntheirs: {theirs}"
    )
    # final weights: convert the torch end state through the (pure-layout)
    # weight converters and compare globally
    want = TI.apply_torch_checkpoint(variables_template, sd_np(ref), cfg)["params"]
    va = np.concatenate(
        [np.asarray(x, np.float64).ravel() for x in jax.tree_util.tree_leaves(final_params)]
    )
    vb = np.concatenate(
        [np.asarray(x, np.float64).ravel() for x in jax.tree_util.tree_leaves(want)]
    )
    assert va.shape == vb.shape
    cos = float(va @ vb) / max(float(np.linalg.norm(va) * np.linalg.norm(vb)), 1e-30)
    rel_l2 = float(np.linalg.norm(va - vb)) / max(float(np.linalg.norm(vb)), 1e-30)
    assert cos >= min_cos, f"final-weight cosine {cos}"
    assert rel_l2 <= max_rel_l2, f"final-weight rel-L2 {rel_l2}"


# ---------------------------------------------------------------------------
# MonoDepth2: Adam depth/pose groups + per-epoch MultiStepLR through the
# jitter/flip pipeline (reference projects/MonoDepth2/train.py:50-62,79-111)
# ---------------------------------------------------------------------------


def _monodepth2_loop_trajectory(
    tmp_path, dn_ours, dn_ref, *, n_frames=20, batch=8, epochs=3,
    var_loss_w=0.0, seed=17, n_steps_expected=None,
    loss_rtol=2e-3, min_cos=1 - 1e-6, max_rel_l2=2e-3,
    f64_oracle=False, oracle_loss_rtol=1e-3, oracle_drift_mult=3.0,
):
    """Shared MonoDepth2-loop trajectory driver (reference
    projects/MonoDepth2/train.py:50-111): Adam depth/pose groups +
    per-epoch MultiStepLR through the jitter/flip pipeline, parameterized
    over the depth net (DepthResNet for resnet18.yaml, PackNet01 for
    packnet_1a.yaml which also enables VAR_LOSS_WEIGHT 1e-4)."""
    from detectron2.modeling.meta_arch.MonoDepth2 import MonoDepth2Model as RefM2

    root = str(tmp_path / "kitti")
    split = _make_kitti(root, n=n_frames, H=H_IMG, W=W_IMG)
    cfg = base_cfg(root, split, str(tmp_path / "w"), str(tmp_path / "out"), False)

    cfg.MODEL.META_ARCHITECTURE = "MonoDepth2Model"
    for k, v in dn_ours.items():
        cfg.MODEL.DEPTH_NET[k] = v
    cfg.MODEL.POSE_NET.NAME = "PoseNet"
    cfg.MODEL.POSE_NET.NUM_CONTEXTS = 2
    loss = cfg.LOSS
    loss.SSIM_WEIGHT = 0.85
    loss.C1, loss.C2, loss.CLIP = 1e-4, 9e-4, 0.0
    loss.AUTOMASK = True
    loss.SMOOTHNESS_WEIGHT = 0.001
    loss.PHOTOMETRIC_REDUCE = "min"
    loss.VARIANCE_FOCUS = 0.85
    loss.VAR_LOSS_WEIGHT = var_loss_w
    cfg.SOLVER.OPT = "adam_multistep"
    cfg.SOLVER.IMS_PER_BATCH = batch
    cfg.SOLVER.DEPTH_LR = 1e-4
    cfg.SOLVER.POSE_LR = 2e-4
    cfg.SOLVER.LR_STEPS = (1,)  # milestone INSIDE the window: exercises the
    cfg.SOLVER.GAMMA = 0.1      # per-epoch schedule application point
    cfg.SOLVER.MAX_EPOCHS = epochs
    cfg.freeze()

    loss_keys = {
        "SSIM_WEIGHT": 0.85, "C1": 1e-4, "C2": 9e-4, "CLIP": 0.0,
        "AUTOMASK": True, "PHOTOMETRIC_REDUCE": "min",
        "SMOOTHNESS_WEIGHT": 0.001, "SUPERVISED_WEIGHT": 0.0,
        "VAR_LOSS_WEIGHT": var_loss_w, "VARIANCE_FOCUS": 0.85,
    }
    rcfg = nested(
        {
            "MODEL": {
                "META_ARCHITECTURE": "MonoDepth2Model",
                "DEPTH_NET": dict(dn_ref),
                "POSE_NET": {"NAME": "PoseNet", "NUM_CONTEXTS": 2},
                "MAX_DEPTH": 80.0,
                "PIXEL_MEAN": [0.485, 0.456, 0.406],
                "PIXEL_STD": [0.229, 0.224, 0.225],
            },
            "LOSS": dict(loss_keys),
        }
    )
    torch.manual_seed(seed)
    ref = RefM2(rcfg).train()
    # pristine float64 copy BEFORE any patching/replay (its trajectory is
    # the noise-floor oracle; copied pre-patch so its closure binds to the
    # copy, not the original)
    ref64 = None
    if f64_oracle:
        import copy

        ref64 = copy.deepcopy(ref).double()

    # Reference-HEAD latent bug workaround (identical to the loss/grad
    # parity tests): view_synthesis reads H,W from t's shape, degenerating
    # the rigid [B,3,1,1] t — feed it dense (same math, K·t constant/pixel).
    def patch_dense_t(module):
        orig_rcl = module.rgb_consistency_loss

        def rcl_dense_t(frame_A, frame_B, depth_A, intrinsics, R=None, t=None):
            if t is not None:
                h, w = depth_A.shape[-2:]
                t = t.expand(-1, -1, h, w)
            return orig_rcl(frame_A, frame_B, depth_A, intrinsics, R, t)

        module.rgb_consistency_loss = rcl_dense_t

    patch_dense_t(ref)
    if ref64 is not None:
        patch_dense_t(ref64)

    batches, ours, final, steps_per_epoch = run_ours(cfg, ref)
    assert len(batches) == epochs * steps_per_epoch
    if n_steps_expected is not None:
        assert len(batches) >= n_steps_expected

    def make_opt_and_step(ref):
        opt = torch.optim.Adam(
            [
                {"params": ref.depth_net.parameters(), "lr": 1e-4, "weight_decay": 0.0},
                {"params": ref.pose_net.parameters(), "lr": 2e-4, "weight_decay": 0.0},
            ]
        )
        sched = torch.optim.lr_scheduler.MultiStepLR(opt, milestones=[1], gamma=0.1)

        def after_step(i, epoch_end):
            if epoch_end:
                sched.step()

        return opt, after_step

    theirs = replay_torch(ref, batches, steps_per_epoch, make_opt_and_step)

    model = build_model(cfg)
    tmpl_batch = {k: v for k, v in batches[0].items() if hasattr(v, "shape")}
    variables_template = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        tmpl_batch,
        train=True,
    )
    assert_trajectories_match(
        ours, theirs, final.params, ref, cfg, variables_template,
        loss_rtol=loss_rtol, min_cos=min_cos, max_rel_l2=max_rel_l2,
    )

    if f64_oracle:
        # float64-oracle calibration (same protocol as test_bts_trajectory):
        # our f32 end weights must sit within oracle_drift_mult× torch-f32's
        # own distance from the f64 trajectory — a real backward/update bug
        # compounds PAST the oracle band over the window, cross-framework
        # f32 noise does not.
        oracle_losses = replay_torch(
            ref64, batches, steps_per_epoch, make_opt_and_step,
            dtype=torch.float64,
        )
        np.testing.assert_allclose(theirs, oracle_losses, rtol=oracle_loss_rtol)

        def flat(tree):
            return np.concatenate(
                [np.asarray(x, np.float64).ravel()
                 for x in jax.tree_util.tree_leaves(tree)]
            )

        w_oracle = flat(
            TI.apply_torch_checkpoint(variables_template, sd_np(ref64), cfg)["params"]
        )
        w_torch = flat(
            TI.apply_torch_checkpoint(variables_template, sd_np(ref), cfg)["params"]
        )
        w_ours = flat(final.params)
        scale = max(float(np.linalg.norm(w_oracle)), 1e-30)
        d_ours = float(np.linalg.norm(w_ours - w_oracle)) / scale
        d_torch = float(np.linalg.norm(w_torch - w_oracle)) / scale
        assert d_ours <= oracle_drift_mult * max(d_torch, 1e-7), (
            f"ours drifted {d_ours} from the f64 oracle vs torch-f32's {d_torch}"
        )


def test_monodepth2_trajectory(tmp_path):
    _monodepth2_loop_trajectory(
        tmp_path,
        dn_ours={"NAME": "DepthResNet", "ENCODER_NAME": "18",
                 "UPSAMPLE_DEPTH": False},
        dn_ref={"NAME": "DepthResNet", "ENCODER_NAME": "18",
                "UPSAMPLE_DEPTH": False},
        n_frames=20, batch=8, epochs=3, n_steps_expected=6,
    )


@pytest.mark.slow
def test_monodepth2_long_trajectory(tmp_path):
    """30-optimizer-step horizon (15 epochs × 2 steps) with the f64-oracle
    calibration: exposes sub-noise-floor drift (a systematically biased
    gradient or schedule misapplication) that the 6–9-step windows cannot —
    over 30 compounding Adam steps a real error outgrows the oracle band
    while symmetric f32 rounding stays inside it (VERDICT r3 item 6)."""
    _monodepth2_loop_trajectory(
        tmp_path,
        dn_ours={"NAME": "DepthResNet", "ENCODER_NAME": "18",
                 "UPSAMPLE_DEPTH": False},
        dn_ref={"NAME": "DepthResNet", "ENCODER_NAME": "18",
                "UPSAMPLE_DEPTH": False},
        n_frames=20, batch=8, epochs=15, seed=17, n_steps_expected=30,
        # loss rtol / weight cosine widen with horizon: trajectories separate
        # at the f32 noise floor (measured at 30 steps: cos 1-1.06e-6,
        # rel-L2 1.5e-3 — pure accumulation, the 3-epoch test sits at
        # 1-~1e-7) and the LR milestone at epoch 1 keeps later steps small;
        # the oracle drift band below is the calibrated bug detector
        loss_rtol=2e-2, min_cos=1 - 5e-6, max_rel_l2=5e-3,
        # torch-f32 itself departs its own f64 replay by up to ~1.1% at the
        # late steps (measured) — that IS the noise floor the oracle
        # calibrates; the drift-band check on the weights is the detector
        f64_oracle=True, oracle_loss_rtol=3e-2,
    )


@pytest.mark.slow
def test_packnet_trajectory(tmp_path):
    """PackNet-1A through the MonoDepth2 loop (packnet_1a.yaml): packed 3D
    convs + GroupNorm(16)+ELU decoder + the VAR_LOSS_WEIGHT 1e-4 variance
    loss compounding over steps.  Bounds one notch looser than
    DepthResNet — the pack/unpack PixelShuffle stacks are
    cancellation-noisier per step (see test_reference_grad_parity)."""
    _monodepth2_loop_trajectory(
        tmp_path,
        dn_ours={"NAME": "PackNet01", "VERSION": "1A", "UPSAMPLE_DEPTH": False},
        dn_ref={"NAME": "PackNet01", "VERSION": "1A", "UPSAMPLE_DEPTH": False},
        n_frames=12, batch=4, epochs=2, var_loss_w=1e-4, seed=29,
        n_steps_expected=4,
        loss_rtol=5e-3, min_cos=1 - 3e-6, max_rel_l2=3e-3,
    )


# ---------------------------------------------------------------------------
# Supervised: AdamW encoder-wd groups + the in-loop post-step poly LR
# reassignment (reference projects/Supervised/train.py:75-135)
# ---------------------------------------------------------------------------


def _supervised_case(tmp_path, name, encoder, n_frames, batch, epochs,
                     mesh_shape=None, extra_dn=()):
    from detectron2.modeling.meta_arch.Supervised import SupDepthModel as RefSup

    root = str(tmp_path / "kitti")
    split = _make_kitti(root, n=n_frames, H=H_IMG, W=W_IMG)
    cfg = base_cfg(root, split, str(tmp_path / "w"), str(tmp_path / "out"), True)
    cfg.MODEL.META_ARCHITECTURE = "SupDepthModel"
    cfg.MODEL.DEPTH_NET.NAME = name
    cfg.MODEL.DEPTH_NET.ENCODER_NAME = encoder
    cfg.MODEL.DEPTH_NET.UPSAMPLE_DEPTH = False
    for k, v in extra_dn:
        cfg.MODEL.DEPTH_NET[k] = v
    cfg.LOSS.VARIANCE_FOCUS = 0.85
    cfg.SOLVER.OPT = "adamw_poly"
    cfg.SOLVER.IMS_PER_BATCH = batch
    cfg.SOLVER.DEPTH_LR = 1e-4
    cfg.SOLVER.DEPTH_END_LR = 1e-5
    cfg.SOLVER.WEIGHT_DECAY = 1e-2
    cfg.SOLVER.MAX_EPOCHS = epochs
    if mesh_shape is not None:
        cfg.TPU.MESH_SHAPE = mesh_shape
    cfg.freeze()

    rcfg = nested(
        {
            "MODEL": {
                "META_ARCHITECTURE": "SupDepthModel",
                "DEPTH_NET": {
                    "NAME": name, "ENCODER_NAME": encoder,
                    "UPSAMPLE_DEPTH": False, "VERSION": "1A", "NORM": "BN",
                    "LEARN_SCALE": False, "BTS_SIZE": 512,
                    "BN_NO_TRACK": False, "FIX_1ST_CONV": False,
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
    torch.manual_seed(23)
    ref = RefSup(rcfg).train()
    return cfg, ref


def _adamw_poly_replay(cfg, max_iter):
    base_lr = float(cfg.SOLVER.DEPTH_LR)
    end_lr = float(cfg.SOLVER.DEPTH_END_LR)

    def make_opt_and_step(ref):
        opt = torch.optim.AdamW(
            [
                {"params": ref.depth_net.encoder.parameters(), "weight_decay": 1e-2},
                {"params": ref.depth_net.decoder.parameters(), "weight_decay": 0.0},
            ],
            lr=base_lr,
            eps=1e-6,
        )

        def after_step(i, epoch_end):
            # the reference recomputes lr from the incremented global_step
            # AFTER opt.step (projects/Supervised/train.py:125-128)
            global_step = i + 1
            curr = (base_lr - end_lr) * (1 - global_step / max_iter) ** 0.9 + end_lr
            for group in opt.param_groups:
                group["lr"] = curr

        return opt, after_step

    return make_opt_and_step


def test_supervised_trajectory(tmp_path):
    cfg, ref = _supervised_case(
        tmp_path, "DepthResNet", "18", n_frames=16, batch=8, epochs=3
    )
    batches, ours, final, steps_per_epoch = run_ours(cfg, ref)
    n_steps = len(batches)
    assert n_steps == 3 * steps_per_epoch >= 6

    theirs = replay_torch(
        ref, batches, steps_per_epoch, _adamw_poly_replay(cfg, n_steps)
    )

    model = build_model(cfg)
    tmpl_batch = {k: v for k, v in batches[0].items() if hasattr(v, "shape")}
    variables_template = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        tmpl_batch,
        train=True,
    )
    assert_trajectories_match(
        ours, theirs, final.params, ref, cfg, variables_template,
        loss_rtol=2e-3, min_cos=1 - 1e-6, max_rel_l2=2e-3,
    )


def test_bts_trajectory(tmp_path):
    """BTS-R50 compound trajectory: N steps of accumulated updates expose
    backward errors below the loose single-step per-leaf floor
    (test_reference_grad_parity.py's BTS thresholds).  Also composes the
    set_misc freezing (solver-side zero-update masks vs torch
    requires_grad=False) across updates with nonzero weight decay."""
    import copy

    cfg, ref = _supervised_case(
        tmp_path, "BtsModel", "resnet50_bts",
        n_frames=10, batch=2, epochs=1, mesh_shape=(1,),
    )
    # pristine float64 copy BEFORE the f32 replay mutates ref in place:
    # its trajectory is the noise-floor oracle
    ref64 = copy.deepcopy(ref).double()

    batches, ours, final, steps_per_epoch = run_ours(cfg, ref)
    n_steps = len(batches)
    assert n_steps == steps_per_epoch == 5

    theirs = replay_torch(
        ref, batches, steps_per_epoch, _adamw_poly_replay(cfg, n_steps)
    )

    model = build_model(cfg)
    tmpl_batch = {k: v for k, v in batches[0].items() if hasattr(v, "shape")}
    variables_template = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        tmpl_batch,
        train=True,
    )
    # BTS backward is cancellation-noisy per-leaf (see grad-parity notes);
    # the trajectory bounds are on the loss sequence + global weight drift.
    # min_cos is set CONSISTENT with max_rel_l2 (rel 2e-3 ⇒ 1−cos ≲ 2.5e-6;
    # measured: cos 1−1.9e-6, rel 1.9e-3) — the f64-oracle check below is
    # the calibrated bug detector.
    assert_trajectories_match(
        ours, theirs, final.params, ref, cfg, variables_template,
        loss_rtol=1e-2, min_cos=1 - 3e-6, max_rel_l2=2e-3,
    )

    # float64-oracle calibration: replay the SAME stream through the
    # reference in double precision; our f32 end weights must sit within 3×
    # torch-f32's own distance from the f64 trajectory — i.e. the ours↔torch
    # gap above is cross-framework f32 noise, not a backward bug (a real
    # gradient error compounds past the oracle band over the 5 steps).
    oracle_losses = replay_torch(
        ref64, batches, steps_per_epoch, _adamw_poly_replay(cfg, n_steps),
        dtype=torch.float64,
    )
    np.testing.assert_allclose(theirs, oracle_losses, rtol=1e-3)

    def flat(tree):
        return np.concatenate(
            [np.asarray(x, np.float64).ravel() for x in jax.tree_util.tree_leaves(tree)]
        )

    w_oracle = flat(
        TI.apply_torch_checkpoint(variables_template, sd_np(ref64), cfg)["params"]
    )
    w_torch = flat(
        TI.apply_torch_checkpoint(variables_template, sd_np(ref), cfg)["params"]
    )
    w_ours = flat(final.params)
    scale = max(float(np.linalg.norm(w_oracle)), 1e-30)
    d_ours = float(np.linalg.norm(w_ours - w_oracle)) / scale
    d_torch = float(np.linalg.norm(w_torch - w_oracle)) / scale
    assert d_torch < 2e-3, f"torch f32 drift unexpectedly large: {d_torch}"
    assert d_ours <= 3.0 * max(d_torch, 1e-7), (
        f"ours drifted {d_ours} from the f64 oracle vs torch-f32's {d_torch}"
    )


# ---------------------------------------------------------------------------
# MotionLearning: the most loop-coupled family — RandLayerNorm stddev ramp +
# motion burn-in weight as traced batch scalars, Adam(eps=1e-7) depth/pose
# groups, global grad-norm clip, MultiStepLR (reference
# projects/MotionLearning/train.py:53-174).  NOISE_STDDEV=0 so randLN noise
# is not a confound (the ramp's application POINT is still composed every
# step: global_step = completed_steps + 1, train.py:97-109); the burn-in
# weight ramps THROUGH the window so a schedule off-by-one shifts the loss
# sequence detectably.
#
# Latent reference bug at stddev=0: RandLayerNorm's training branch computes
# ``fmod(randn·stddev, 2·stddev)`` (reference layer_norm.py:28-29) which is
# fmod(0,0)=NaN at stddev exactly 0 — the reference never hits it only
# because its ramp is strictly positive from step 1 and set_stddev is gated
# on RAMPUP_ITERS>0.  Our RandLayerNorm guards the divisor
# (models/layers.py:126) so stddev=0 is exact identity noise; the replay
# reproduces that semantics by putting the reference's RandLayerNorm modules
# in eval() (their ONLY train-mode behavior is the noise) instead of calling
# set_stddev(0) into the NaN.
# ---------------------------------------------------------------------------


def _motionlearning_trajectory(
    tmp_path, *, epochs=3, burn_in=8, n_steps_expected=6,
    band_floor=2e-3, min_cos=1 - 1e-6, max_rel_l2=3e-3, drift_mult=3.0,
):
    from detectron2.modeling.meta_arch.MotionLearning import (
        MotionLearningModel as RefML,
    )
    from projects.MotionLearning.train import make_schedule_fn

    root = str(tmp_path / "kitti")
    split = _make_kitti(root, n=20, H=H_IMG, W=W_IMG)
    cfg = base_cfg(root, split, str(tmp_path / "w"), str(tmp_path / "out"), False)
    cfg.DATASETS.TRAIN.BACKWARD_CONTEXT = 0  # ML Base.yaml: FORWARD_CONTEXT 1 only

    cfg.MODEL.META_ARCHITECTURE = "MotionLearningModel"
    dn = cfg.MODEL.DEPTH_NET
    dn.NAME = "GoogleResNet"
    dn.ENCODER_NAME = "18"
    dn.NORM = "randLN"
    dn.LEARN_SCALE = False
    dn.UPSAMPLE_DEPTH = False
    dn.NOISE_STDDEV = 0.0   # deterministic replay; ramp applied every step
    dn.RAMPUP_ITERS = 10
    pn = cfg.MODEL.POSE_NET
    pn.NAME = "GoogleMotionNet"
    pn.USE_DEPTH = True
    pn.GROUP_NORM = False
    pn.MASK_MOTION = True
    pn.LEARN_SCALE = True
    pn.SCALE_CONSTRAIN = "clip_ste"   # resnet18.yaml
    pn.BURN_IN_ITERS = burn_in  # ramps 0 → 1 partway through the window

    loss_keys = {
        "NUM_SCALES": 1, "SSIM_WEIGHT": 3.0, "C2": 9e-6,
        "CLIP": 0.0, "DEPTH_L1_WEIGHT": 0.0, "SMOOTHNESS_WEIGHT": 0.001,
        "SUPERVISED_WEIGHT": 0.0, "VARIANCE_FOCUS": 0.85,
        "VAR_LOSS_WEIGHT": 0.0, "MOTION_SMOOTHNESS_WEIGHT": 1.0,
        "MOTION_SPARSITY_WEIGHT": 0.2, "ROT_CYCLE_WEIGHT": 1e-3,
        "TRANS_CYCLE_WEIGHT": 5e-2, "SCALE_NORMALIZE": False,
    }
    loss = cfg.LOSS
    loss.C1 = "inf"
    for k, v in loss_keys.items():
        loss[k] = v

    solver = cfg.SOLVER
    solver.OPT = "adam_multistep"
    solver.EPS = 1e-7        # reference train.py:64-67
    solver.IMS_PER_BATCH = 8
    solver.DEPTH_LR = 2e-4
    solver.POSE_LR = 2e-4
    solver.LR_STEPS = (1,)   # milestone inside the window
    solver.GAMMA = 0.5
    solver.MAX_EPOCHS = epochs
    solver.GRAD_CLIP = 1.0   # small enough that the clip actually fires
    cfg.freeze()

    rcfg = nested(
        {
            "MODEL": {
                "META_ARCHITECTURE": "MotionLearningModel",
                "DEPTH_NET": {
                    "NAME": "GoogleResNet", "ENCODER_NAME": "18",
                    "NORM": "randLN", "LEARN_SCALE": False,
                    "UPSAMPLE_DEPTH": False,
                    "NOISE_STDDEV": 0.0, "RAMPUP_ITERS": 10,
                },
                "POSE_NET": {
                    "NAME": "GoogleMotionNet", "USE_DEPTH": True,
                    "GROUP_NORM": False, "MASK_MOTION": True,
                    "LEARN_SCALE": True, "SCALE_CONSTRAIN": "clip_ste",
                    "BURN_IN_ITERS": burn_in,
                },
                "MAX_DEPTH": 80.0,
                "PIXEL_MEAN": [0.485, 0.456, 0.406],
                "PIXEL_STD": [0.229, 0.224, 0.225],
                "WITH_MASK": False,
                "RETURN_LOSS": False,
            },
            "LOSS": {**loss_keys, "C1": float("inf")},
        }
    )
    torch.manual_seed(31)
    ref = RefML(rcfg).train()
    # stddev=0 determinization without the reference's fmod(0,0) NaN (see
    # block comment above): noise off via eval() on just the randLN modules
    from detectron2.layers.layer_norm import RandLayerNorm as RefRLN

    for m in ref.modules():
        if isinstance(m, RefRLN):
            m.eval()

    # pristine float64 copy (after the randLN eval-patch, before the f32
    # replay mutates ref): its trajectory is the per-step noise-floor oracle
    import copy

    ref64 = copy.deepcopy(ref).double()

    batches, ours, final, steps_per_epoch = run_ours(
        cfg, ref, extra_batch_fn=make_schedule_fn(cfg)
    )
    metrics = run_ours.last_metrics
    n_steps = len(batches)
    assert n_steps == epochs * steps_per_epoch >= n_steps_expected

    # the window must actually exercise the machinery under test:
    grad_norms = np.array([m["grad_norm"] for m in metrics])
    assert (grad_norms > solver.GRAD_CLIP).any(), grad_norms
    burn_weights = np.clip(
        2.0 * (np.arange(n_steps) + 1) / pn.BURN_IN_ITERS - 1.0, 0.0, 1.0
    )
    assert ((burn_weights > 0) & (burn_weights < 1)).any(), burn_weights

    def make_opt_and_step(ref):
        opt = torch.optim.Adam(
            [
                {"params": ref.depth_net.parameters(), "lr": 2e-4},
                {"params": ref.pose_net.parameters(), "lr": 2e-4},
            ],
            weight_decay=0.0,
            eps=1e-7,
        )
        sched = torch.optim.lr_scheduler.MultiStepLR(opt, milestones=[1], gamma=0.5)

        def after_step(i, epoch_end):
            if epoch_end:
                sched.step()

        return opt, after_step

    def before_step(i, ref):
        # reference train.py:97-114: schedules from the PRE-incremented step
        # (set_stddev skipped: NOISE_STDDEV=0 → the randLN modules run in
        # eval() to avoid the reference's fmod(0,0) NaN, see above)
        global_step = i + 1
        if rcfg.MODEL.POSE_NET.BURN_IN_ITERS > 0:
            ref.pose_net.motion_weight = float(
                np.clip(2.0 * global_step / rcfg.MODEL.POSE_NET.BURN_IN_ITERS - 1.0,
                        0.0, 1.0)
            )

    def post_backward(i, ref):
        torch.nn.utils.clip_grad_norm_(ref.parameters(), solver.GRAD_CLIP)

    theirs = replay_torch(
        ref, batches, steps_per_epoch, make_opt_and_step,
        before_step=before_step, post_backward=post_backward,
    )

    model = build_model(cfg)
    tmpl_batch = {k: v for k, v in batches[0].items() if hasattr(v, "shape")}
    tmpl_batch = dict(tmpl_batch, noise_stddev=np.float32(0.0),
                      motion_weight=np.float32(1.0))
    variables_template = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        tmpl_batch,
        train=True,
    )
    # The ML loss is indicator-function-branchy (mask_motion threshold,
    # occlusion masks): once the burn-in switches the motion terms on, tiny
    # f32 weight differences flip near-threshold pixels and the loss
    # sequences separate CHAOTICALLY, not linearly — measured: torch-f32
    # itself departs its own f64 replay by ~the same per-step magnitudes as
    # ours does.  So the per-step criterion is oracle-calibrated instead of
    # a fixed rtol: our distance from the f64 trajectory must stay within
    # 3× torch-f32's own distance (plus a 2e-3 relative floor for the
    # pre-divergence steps where both are at the plain f32 noise level).
    oracle = np.asarray(
        replay_torch(
            ref64, batches, steps_per_epoch, make_opt_and_step,
            dtype=torch.float64,
            before_step=before_step, post_backward=post_backward,
        )
    )
    ours_a, theirs_a = np.asarray(ours), np.asarray(theirs)
    band = 3.0 * np.maximum(np.abs(theirs_a - oracle), band_floor * np.abs(oracle))
    assert (np.abs(ours_a - oracle) <= band).all(), (
        f"ours-vs-f64 {np.abs(ours_a - oracle)} exceeds calibrated band "
        f"{band}\nours:   {ours_a}\ntorch32:{theirs_a}\noracle: {oracle}"
    )

    # weight-space: global cosine/rel-L2 vs torch-f32 (robust to the loss
    # chaos — the weights move little over 6 clipped steps), plus the same
    # oracle drift-band check as BTS
    want = TI.apply_torch_checkpoint(variables_template, sd_np(ref), cfg)["params"]

    def flat(tree):
        return np.concatenate(
            [np.asarray(x, np.float64).ravel()
             for x in jax.tree_util.tree_leaves(tree)]
        )

    w_ours, w_torch = flat(final.params), flat(want)
    w_oracle = flat(
        TI.apply_torch_checkpoint(variables_template, sd_np(ref64), cfg)["params"]
    )
    cos = float(w_ours @ w_torch) / max(
        float(np.linalg.norm(w_ours) * np.linalg.norm(w_torch)), 1e-30
    )
    rel_l2 = float(np.linalg.norm(w_ours - w_torch)) / max(
        float(np.linalg.norm(w_torch)), 1e-30
    )
    assert cos >= min_cos, f"final-weight cosine {cos}"
    assert rel_l2 <= max_rel_l2, f"final-weight rel-L2 {rel_l2}"
    scale = max(float(np.linalg.norm(w_oracle)), 1e-30)
    d_ours = float(np.linalg.norm(w_ours - w_oracle)) / scale
    d_torch = float(np.linalg.norm(w_torch - w_oracle)) / scale
    assert d_ours <= drift_mult * max(d_torch, 1e-7), (
        f"ours drifted {d_ours} from the f64 oracle vs torch-f32's {d_torch}"
    )


@pytest.mark.slow
def test_motionlearning_trajectory(tmp_path):
    _motionlearning_trajectory(tmp_path)


@pytest.mark.slow
def test_motionlearning_long_trajectory(tmp_path):
    """30-optimizer-step horizon for the schedule-heaviest family (VERDICT
    r4 item 6): 15 epochs × 2 steps with the motion burn-in ramp stretched
    to 20 steps so the traced ``motion_weight`` schedule stays in its
    partial regime (0 < w < 1) for two thirds of the window, the LR
    milestone at epoch 1, and grad-clip firing throughout.  Same
    f64-oracle-calibrated per-step band + end-weight drift-band protocol as
    the short test; the loss band floor widens with horizon (the ML loss is
    indicator-branchy and separates chaotically — the calibrated oracle
    band, not a fixed rtol, is the detector; see the short test's block
    comment).  Bounds calibrated from measured 30-step runs."""
    _motionlearning_trajectory(
        tmp_path, epochs=15, burn_in=20, n_steps_expected=30,
        band_floor=5e-3, min_cos=1 - 1e-5, max_rel_l2=1e-2, drift_mult=3.0,
    )
