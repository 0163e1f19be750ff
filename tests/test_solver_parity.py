"""Optimizer-trajectory parity vs the reference's torch.optim recipes.

Together with tests/test_reference_grad_parity.py (gradients match) and
test_reference_parity.py (forward/loss match), this closes the training-step
chain: identical weights + identical batches produce identical updates.

Reference recipes replicated exactly:
- MonoDepth2: Adam with depth/pose LR groups + per-epoch MultiStepLR
  (reference projects/MonoDepth2/train.py:50-62,109);
- MotionLearning: Adam(eps=1e-7) (projects/MotionLearning/train.py:69-74);
- Supervised: AdamW(eps=1e-6) with encoder wd=1e-2 / decoder wd=0 groups and
  the post-step poly LR assignment (projects/Supervised/train.py:77-82,125-128).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from simpledepthestimation_tpu.config import get_cfg
from simpledepthestimation_tpu.solver.build import build_optimizer

STEPS_PER_EPOCH = 3
N_EPOCHS = 4


def _np_tree(seed):
    rng = np.random.RandomState(seed)
    return {
        "depth_net": {
            "encoder": {"w": rng.randn(4, 3).astype(np.float32)},
            "decoder": {"w": rng.randn(6).astype(np.float32)},
        },
        "pose_net": {"conv": {"w": rng.randn(2, 5).astype(np.float32)}},
    }


def _grad_seq(n):
    return [_np_tree(100 + i) for i in range(n)]


def _leaves(tree):
    """Deterministic (path, array) list — same order in torch and jax."""
    out = []

    def walk(t, path):
        if isinstance(t, dict):
            for k in sorted(t):
                walk(t[k], f"{path}/{k}")
        else:
            out.append((path, t))

    walk(tree, "")
    return out


def _run_ours(cfg, params_np, grads_np):
    tx, _ = build_optimizer(cfg, STEPS_PER_EPOCH)
    params = jax.tree_util.tree_map(jnp.asarray, params_np)
    state = tx.init(params)

    @jax.jit
    def step(params, state, grads):
        updates, state = tx.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    for g in grads_np:
        params, state = step(params, state, jax.tree_util.tree_map(jnp.asarray, g))
    return jax.tree_util.tree_map(np.asarray, params)


def _torch_steps(params_t, grads_np, make_step):
    """Drive torch for N_EPOCHS × STEPS_PER_EPOCH updates; make_step is
    called as make_step(update_index) after grads are filled."""
    i = 0
    for _ in range(N_EPOCHS):
        for _ in range(STEPS_PER_EPOCH):
            for path, p in params_t:
                g = dict(_leaves(grads_np[i]))[path]
                p.grad = torch.from_numpy(g.copy())
            make_step(i)
            i += 1


def _assert_matches(params_t, ours):
    got = dict(_leaves(ours))
    for path, p in params_t:
        np.testing.assert_allclose(
            got[path], p.detach().numpy(), rtol=1e-5, atol=1e-7, err_msg=path
        )


def test_adam_multistep_trajectory():
    """Adam depth/pose groups + MultiStepLR stepped per epoch."""
    params_np = _np_tree(7)
    grads_np = _grad_seq(N_EPOCHS * STEPS_PER_EPOCH)

    cfg = get_cfg()
    cfg.SOLVER.OPT = "adam_multistep"
    cfg.SOLVER.DEPTH_LR = 1e-3
    cfg.SOLVER.POSE_LR = 2e-3
    cfg.SOLVER.LR_STEPS = (1, 3)  # epochs
    cfg.SOLVER.GAMMA = 0.5
    cfg.SOLVER.EPS = 1e-7  # the MotionLearning variant
    cfg.SOLVER.MAX_EPOCHS = N_EPOCHS

    params_t = [(p, torch.nn.Parameter(torch.from_numpy(a.copy()))) for p, a in _leaves(params_np)]
    depth = [p for path, p in params_t if "depth_net" in path]
    pose = [p for path, p in params_t if "pose_net" in path]
    opt = torch.optim.Adam(
        [
            {"params": depth, "lr": 1e-3},
            {"params": pose, "lr": 2e-3},
        ],
        weight_decay=0.0,
        eps=1e-7,
    )
    sched = torch.optim.lr_scheduler.MultiStepLR(opt, milestones=[1, 3], gamma=0.5)

    def make_step(i):
        opt.step()
        opt.zero_grad()
        if (i + 1) % STEPS_PER_EPOCH == 0:
            sched.step()

    _torch_steps(params_t, grads_np, make_step)
    ours = _run_ours(cfg, params_np, grads_np)
    _assert_matches(params_t, ours)


def test_adamw_poly_trajectory():
    """AdamW encoder-wd/decoder-no-wd groups + the reference's post-step
    poly LR reassignment (projects/Supervised/train.py:125-128)."""
    params_np = _np_tree(9)
    grads_np = _grad_seq(N_EPOCHS * STEPS_PER_EPOCH)

    base_lr, end_lr = 1e-4, 1e-5
    max_iter = N_EPOCHS * STEPS_PER_EPOCH

    cfg = get_cfg()
    cfg.SOLVER.OPT = "adamw_poly"
    cfg.SOLVER.DEPTH_LR = base_lr
    cfg.SOLVER.DEPTH_END_LR = end_lr
    cfg.SOLVER.WEIGHT_DECAY = 1e-2
    cfg.SOLVER.MAX_EPOCHS = N_EPOCHS

    params_t = [(p, torch.nn.Parameter(torch.from_numpy(a.copy()))) for p, a in _leaves(params_np)]
    enc = [p for path, p in params_t if "encoder" in path]
    dec = [p for path, p in params_t if "encoder" not in path]
    opt = torch.optim.AdamW(
        [
            {"params": enc, "weight_decay": 1e-2},
            {"params": dec, "weight_decay": 0.0},
        ],
        lr=base_lr,
        eps=1e-6,
    )

    def make_step(i):
        opt.step()
        opt.zero_grad()
        # the reference recomputes lr from the incremented global_step
        global_step = i + 1
        curr = (base_lr - end_lr) * (1 - global_step / max_iter) ** 0.9 + end_lr
        for group in opt.param_groups:
            group["lr"] = curr

    _torch_steps(params_t, grads_np, make_step)
    ours = _run_ours(cfg, params_np, grads_np)
    _assert_matches(params_t, ours)


def test_reference_supervised_yaml_end_lr():
    """The reference's own Supervised Base.yaml keys (DEPTH_END_LR) reach the
    poly schedule unchanged."""
    cfg = get_cfg()
    cfg.merge_from_file("/root/reference/projects/Supervised/configs/Base.yaml")
    cfg.SOLVER.OPT = "adamw_poly"
    _, sched = build_optimizer(cfg, 100)
    max_steps = int(cfg.SOLVER.MAX_EPOCHS) * 100
    assert float(sched(0)) == pytest.approx(1e-4)
    assert float(sched(max_steps)) == pytest.approx(1e-5)
