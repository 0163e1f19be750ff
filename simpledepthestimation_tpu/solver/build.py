"""Optimizers and LR schedules (optax).

Covers the reference's per-project solver recipes:

- Supervised (reference projects/Supervised/train.py:47-60,125-128): AdamW
  with encoder weight-decay 1e-2 / decoder 0, poly decay
  ``(lr−end)·(1−step/max)^0.9 + end`` applied per step.
- MonoDepth2 (projects/MonoDepth2/train.py:50-62): Adam with separate
  depth/pose LR groups + MultiStepLR(steps, gamma).
- MotionLearning (projects/MotionLearning/train.py:64-77): Adam(eps=1e-7)
  with depth/pose groups + MultiStepLR + grad clipping (handled in the
  train step via SOLVER.GRAD_CLIP).

Param groups are expressed with ``optax.multi_transform`` over path-prefix
labels instead of torch param-group lists.
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


def poly_lr_schedule(
    base_lr: float, end_lr: float, max_steps: int, power: float = 0.9
) -> optax.Schedule:
    """(base−end)·(1−step/max)^power + end."""

    def schedule(step):
        frac = jnp.clip(step / max(max_steps, 1), 0.0, 1.0)
        return (base_lr - end_lr) * (1.0 - frac) ** power + end_lr

    return schedule


def multistep_lr_schedule(
    base_lr: float, milestones: Sequence[int], gamma: float = 0.1
) -> optax.Schedule:
    """torch MultiStepLR: multiply by gamma at each milestone step."""

    def schedule(step):
        lr = jnp.asarray(base_lr, jnp.float32)
        for m in milestones:
            lr = jnp.where(step >= m, lr * gamma, lr)
        return lr

    return schedule


def make_param_group_label_fn(groups: Dict[str, Sequence[str]], default: str) -> Callable:
    """Label each param leaf by the first matching top-level path prefix.

    groups: label -> list of path substrings (matched against the '/'-joined
    param path).
    """

    def label_tree(params):
        flat = jax.tree_util.tree_flatten_with_path(params)[0]

        def label_for(path):
            path_str = "/".join(str(getattr(k, "key", k)) for k in path)
            for label, prefixes in groups.items():
                if any(p in path_str for p in prefixes):
                    return label
            return default

        labels = [label_for(path) for path, _ in flat]
        treedef = jax.tree_util.tree_structure(params)
        return jax.tree_util.tree_unflatten(treedef, labels)

    return label_tree


def _adamw(lr_schedule, weight_decay: float, eps: float) -> optax.GradientTransformation:
    return optax.adamw(lr_schedule, weight_decay=weight_decay, eps=eps)


def _adam(lr_schedule, eps: float) -> optax.GradientTransformation:
    return optax.adam(lr_schedule, eps=eps)


def _freeze_rule_matches(path_str: str, rule) -> bool:
    """A rule is a substring, or a tuple of substrings that must ALL appear
    (used to scope block-local names like ``/bn1/`` to the encoder subtree,
    mirroring the reference's named_children 'encoder' scoping)."""
    parts = (rule,) if isinstance(rule, str) else rule
    return all(p in path_str for p in parts)


def freeze_substrings_from_cfg(cfg) -> Sequence:
    """Frozen-parameter rules mirroring the reference's ``set_misc``
    (BTSNet.py:382-412), which BtsModel applies UNCONDITIONALLY at
    construction: even with both FIX flags off it freezes the encoder stem
    conv and every encoder BatchNorm affine pair ('fixing first conv
    layer'); FIX_1ST_CONV / FIX_1ST_CONVS additionally freeze the first
    one / two residual blocks. Torch's ``.bn`` substring does NOT match
    torchvision's ``downsample.1`` BNs, so those stay trainable here too.
    Other depth nets never call set_misc — no freezing outside BtsModel.
    torchvision mobilenet_v2 parameter names contain neither 'conv0' nor
    'norm', so the reference's substrings freeze nothing there — preserved.
    """
    dn = cfg.MODEL.get("DEPTH_NET", {})
    if str(dn.get("NAME", "")) != "BtsModel":
        return []
    enc = str(dn.get("ENCODER_NAME", ""))
    if enc.startswith("mobilenet"):
        return []
    if "resne" in enc:
        rules = [
            "encoder/conv1/",
            ("encoder/", "/bn1/"),
            ("encoder/", "/bn2/"),
            ("encoder/", "/bn3/"),
        ]
        if dn.get("FIX_1ST_CONVS", False):
            rules += ["encoder/layer1_0/", "encoder/layer1_1/"]
        elif dn.get("FIX_1ST_CONV", False):
            rules += ["encoder/layer1_0/"]
    else:  # densenet: reference substrings ['conv0', 'norm', denselayers]
        rules = ["encoder/conv0/", ("encoder/", "norm")]
        if dn.get("FIX_1ST_CONVS", False):
            rules += ["encoder/dense1_0/", "encoder/dense1_1/"]
        elif dn.get("FIX_1ST_CONV", False):
            rules += ["encoder/dense1_0/"]
    return rules


def apply_freeze(tx: optax.GradientTransformation, frozen: Sequence) -> optax.GradientTransformation:
    """Wrap tx so params whose path matches a frozen rule get zero updates."""
    if not frozen:
        return tx

    def label_tree(params):
        flat = jax.tree_util.tree_flatten_with_path(params)[0]

        def label(path):
            path_str = "/".join(str(getattr(k, "key", k)) for k in path) + "/"
            return "frozen" if any(_freeze_rule_matches(path_str, f) for f in frozen) else "train"

        labels = [label(p) for p, _ in flat]
        return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(params), labels)

    return optax.multi_transform({"train": tx, "frozen": optax.set_to_zero()}, label_tree)


def build_optimizer(cfg, steps_per_epoch: int) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    """Build the optimizer for cfg.SOLVER. Returns (tx, lr_schedule_for_logging).

    SOLVER.OPT selects the recipe:
      'adamw_poly'      — Supervised: AdamW, encoder wd / no-decoder-wd groups, poly LR
      'adam_multistep'  — MonoDepth2/MotionLearning: Adam, depth/pose LR groups,
                          MultiStepLR over epochs
    Frozen-parameter masks (BTS FIX_1ST_CONV options) wrap the result.
    """
    solver = cfg.SOLVER
    max_steps = int(solver.MAX_EPOCHS) * steps_per_epoch
    opt_name = str(solver.get("OPT", "adam_multistep"))

    if opt_name == "adamw_poly":
        base_lr = float(solver.DEPTH_LR)
        # reference configs name this DEPTH_END_LR (projects/Supervised/
        # configs/Base.yaml:42); END_LR kept as an alias for older repo yamls
        end_lr = float(
            solver.get("DEPTH_END_LR", solver.get("END_LR", base_lr * 0.1))
        )
        wd = float(solver.get("WEIGHT_DECAY", 1e-2))
        # reference projects/Supervised/train.py:82 builds AdamW(eps=1e-6)
        eps = float(solver.get("EPS", 1e-6))
        sched = poly_lr_schedule(base_lr, end_lr, max_steps)
        label_fn = make_param_group_label_fn(
            {"encoder": ["encoder"]}, default="decoder"
        )
        tx = optax.multi_transform(
            {
                "encoder": _adamw(sched, weight_decay=wd, eps=eps),
                "decoder": _adamw(sched, weight_decay=0.0, eps=eps),
            },
            label_fn,
        )
        return apply_freeze(tx, freeze_substrings_from_cfg(cfg)), sched

    if opt_name == "adam_multistep":
        depth_lr = float(solver.DEPTH_LR)
        pose_lr = float(solver.get("POSE_LR", depth_lr))
        milestones_epochs = solver.get("LR_STEPS", ())
        if isinstance(milestones_epochs, (int, float)):
            milestones_epochs = (milestones_epochs,)
        milestones = [int(m) * steps_per_epoch for m in milestones_epochs]
        gamma = float(solver.get("GAMMA", 0.1))
        eps = float(solver.get("EPS", 1e-8))

        depth_sched = multistep_lr_schedule(depth_lr, milestones, gamma)
        pose_sched = multistep_lr_schedule(pose_lr, milestones, gamma)
        label_fn = make_param_group_label_fn({"pose": ["pose_net"]}, default="depth")
        tx = optax.multi_transform(
            {"depth": _adam(depth_sched, eps), "pose": _adam(pose_sched, eps)},
            label_fn,
        )
        return apply_freeze(tx, freeze_substrings_from_cfg(cfg)), depth_sched

    raise ValueError(f"Unknown SOLVER.OPT {opt_name!r}")
