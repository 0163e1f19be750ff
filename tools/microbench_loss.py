#!/usr/bin/env python
"""Bisect MonoDepth2 step cost: nets-only fwd+bwd vs loss-machinery-only
fwd+bwd at the benchmark shape."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from simpledepthestimation_tpu.engine.defaults import enable_compilation_cache

    enable_compilation_cache()

    from __graft_entry__ import _tiny_cfg, _train_batch
    from simpledepthestimation_tpu.models import build_model

    B, H, W = 16, 192, 640
    batch = {k: jnp.asarray(v) for k, v in _train_batch(B, H, W).items()}

    cfg = _tiny_cfg("bfloat16")
    model = build_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        batch,
        train=True,
    )
    params = variables["params"]
    batch_stats = variables["batch_stats"]

    def timed(fn, *args, steps=20):
        jitted = jax.jit(fn)
        out = jitted(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = jitted(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / steps * 1000

    # 1. nets only: depth net + pose net fwd+bwd with a trivial loss
    def nets_loss(p):
        from simpledepthestimation_tpu.models.meta_arch import normalize_image

        net_in = normalize_image(batch["img"], model.pixel_mean, model.pixel_std)
        depths = model.depth_net.apply(
            {"params": p["depth_net"], "batch_stats": batch_stats["depth_net"]},
            net_in, flip=batch["flip"], train=True, mutable=["batch_stats"],
        )[0]
        ctx = batch["ctx_img"]
        pose_in = jnp.concatenate([batch["img"], ctx[:, 0], ctx[:, 1]], -1)
        poses = model.pose_net.apply({"params": p["pose_net"]}, pose_in, train=True)
        return sum(jnp.mean(d) for d in depths) + sum(jnp.mean(T) for T in poses)

    print(f"nets-only fwd+bwd:        {timed(jax.grad(nets_loss), params):8.1f} ms")

    # 2. full step fwd+bwd
    def full_loss(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": batch_stats},
            batch, train=True, mutable=["batch_stats"],
            rngs={"noise": jax.random.PRNGKey(2)},
        )
        return sum(out.values())

    print(f"full model fwd+bwd:       {timed(jax.grad(full_loss), params):8.1f} ms")

    # 3. loss machinery only: gradients w.r.t. precomputed depths/poses
    from simpledepthestimation_tpu.geometry.camera import (
        resize_img, scale_intrinsics, view_synthesis,
    )
    from simpledepthestimation_tpu.models import losses as L

    depths0 = [
        jnp.asarray(np.random.RandomState(i).uniform(1, 80, (B, H // 2**i, W // 2**i, 1)).astype(np.float32))
        for i in range(4)
    ]
    poses0 = jnp.asarray(
        np.tile(np.eye(4, dtype=np.float32), (2, B, 1, 1))
    )

    def loss_machinery(depths, poses):
        image = batch["img_orig"]
        total = 0.0
        for i in range(4):
            h, w = depths[i].shape[1:3]
            rimg = resize_img(image, (h, w))
            K = scale_intrinsics(batch["intrinsics"], w / W, h / H)
            maps = []
            for j in range(2):
                tgt = resize_img(batch["ctx_img_orig"][:, j], (h, w))
                sampled, _, _, _ = view_synthesis(
                    tgt, depths[i], K, poses[j][:, :3, :3], poses[j][:, :3, 3:4]
                )
                photo = jnp.mean(jnp.abs(sampled - rimg), -1, keepdims=True)
                s = jnp.mean(L.ssim(sampled, rimg), -1, keepdims=True)
                maps.append(0.85 * s + 0.15 * photo)
                photo2 = jnp.mean(jnp.abs(tgt - rimg), -1, keepdims=True)
                s2 = jnp.mean(L.ssim(tgt, rimg), -1, keepdims=True)
                maps.append(0.85 * s2 + 0.15 * photo2)
            total += jnp.mean(jnp.min(jnp.concatenate(maps, -1), -1))
            total += L.smoothness_loss(depths[i], rimg) * 0.001
        return total / 4

    g = jax.grad(lambda ds: loss_machinery(ds, poses0))
    print(f"loss-machinery fwd+bwd:   {timed(g, depths0):8.1f} ms")


if __name__ == "__main__":
    main()
