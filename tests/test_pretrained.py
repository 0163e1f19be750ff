"""Pretrained-encoder conversion test: build a torch-style ResNet-18
state_dict with torch (cpu), convert, inject, and verify forward parity of
the first conv+bn stage."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torch

from simpledepthestimation_tpu.models.resnet import ResNetEncoder
from simpledepthestimation_tpu.models.pretrained import (
    convert_torch_resnet,
    load_pretrained_encoder,
)


def _fake_torch_resnet18_state():
    """Minimal torch-layout resnet18 state_dict with random values."""
    g = torch.Generator().manual_seed(0)
    sd = {}

    def conv(name, cout, cin, k):
        sd[f"{name}.weight"] = torch.randn(cout, cin, k, k, generator=g) * 0.05

    def bn(name, c):
        sd[f"{name}.weight"] = torch.rand(c, generator=g) + 0.5
        sd[f"{name}.bias"] = torch.randn(c, generator=g) * 0.1
        sd[f"{name}.running_mean"] = torch.randn(c, generator=g) * 0.1
        sd[f"{name}.running_var"] = torch.rand(c, generator=g) + 0.5

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    layout = [(64, 64, 2), (128, 64, 2), (256, 128, 2), (512, 256, 2)]
    for li, (planes, inplanes, n_blocks) in enumerate(layout, start=1):
        for b in range(n_blocks):
            cin = inplanes if b == 0 else planes
            conv(f"layer{li}.{b}.conv1", planes, cin, 3)
            bn(f"layer{li}.{b}.bn1", planes)
            conv(f"layer{li}.{b}.conv2", planes, planes, 3)
            bn(f"layer{li}.{b}.bn2", planes)
            if b == 0 and (li > 1):
                conv(f"layer{li}.{b}.downsample.0", planes, cin, 1)
                bn(f"layer{li}.{b}.downsample.1", planes)
    return sd


def test_convert_and_inject(rng, tmp_path):
    sd = _fake_torch_resnet18_state()
    params, stats = convert_torch_resnet(sd, 18)
    assert params["conv1"]["kernel"].shape == (7, 7, 3, 64)
    assert "layer2_0" in params and "downsample_conv" in params["layer2_0"]

    encoder = ResNetEncoder(num_layers=18)
    img = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    variables = encoder.init(jax.random.PRNGKey(0), img, train=False)

    path = tmp_path / "resnet18.pth"
    torch.save(sd, str(path))
    injected = load_pretrained_encoder(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        encoder_path=(),
        num_layers=18,
        weights_file=str(path),
    )
    # empty path tuple means inject at root
    np.testing.assert_allclose(
        np.asarray(injected["params"]["conv1"]["kernel"]),
        np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0)),
        atol=1e-6,
    )

    # stage-1 forward parity vs torch ops
    feats = encoder.apply(
        {"params": injected["params"], "batch_stats": injected["batch_stats"]},
        img,
        train=False,
    )
    timg = torch.from_numpy(np.asarray(img)).permute(0, 3, 1, 2)
    tconv = torch.nn.functional.conv2d(
        timg, sd["conv1.weight"], stride=2, padding=3
    )
    tbn = torch.nn.functional.batch_norm(
        tconv,
        sd["bn1.running_mean"],
        sd["bn1.running_var"],
        sd["bn1.weight"],
        sd["bn1.bias"],
        training=False,
        eps=1e-5,
    )
    trelu = torch.relu(tbn).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(feats[0]), trelu, atol=1e-3)


def test_missing_weights_warns_not_fails(rng, caplog):
    encoder = ResNetEncoder(num_layers=18)
    img = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    variables = encoder.init(jax.random.PRNGKey(0), img, train=False)
    out = load_pretrained_encoder(dict(variables), (), 18, None)
    assert out is not None
