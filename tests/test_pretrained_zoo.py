"""DenseNet / MobileNetV2 pretrained-conversion tests: build
torchvision-layout state_dicts with torch (cpu, random values), convert,
inject into the Flax encoders, and verify kernel placement + stem forward
parity against torch functional ops (reference BTSNet.py:281-311 loads
these encoders from torchvision)."""

import numpy as np

import jax
import jax.numpy as jnp

import torch
import torch.nn.functional as F

from simpledepthestimation_tpu.models.encoders import (
    DenseNetEncoder,
    MobileNetV2Encoder,
)
from simpledepthestimation_tpu.models.pretrained import (
    convert_torch_densenet,
    convert_torch_mobilenetv2,
    load_pretrained_encoder,
)

GEN = torch.Generator().manual_seed(7)


def _conv(sd, name, cout, cin, k):
    sd[f"{name}.weight"] = torch.randn(cout, cin, k, k, generator=GEN) * 0.05


def _bn(sd, name, c):
    sd[f"{name}.weight"] = torch.rand(c, generator=GEN) + 0.5
    sd[f"{name}.bias"] = torch.randn(c, generator=GEN) * 0.1
    sd[f"{name}.running_mean"] = torch.randn(c, generator=GEN) * 0.1
    sd[f"{name}.running_var"] = torch.rand(c, generator=GEN) + 0.5


def _fake_densenet121_state():
    sd = {}
    growth, bn_size = 32, 4
    _conv(sd, "features.conv0", 64, 3, 7)
    _bn(sd, "features.norm0", 64)
    n = 64
    for i, n_layers in enumerate((6, 12, 24, 16), start=1):
        for j in range(1, n_layers + 1):
            t = f"features.denseblock{i}.denselayer{j}"
            in_ch = n + (j - 1) * growth
            _bn(sd, f"{t}.norm1", in_ch)
            _conv(sd, f"{t}.conv1", bn_size * growth, in_ch, 1)
            _bn(sd, f"{t}.norm2", bn_size * growth)
            _conv(sd, f"{t}.conv2", growth, bn_size * growth, 3)
        n += n_layers * growth
        if i != 4:
            _bn(sd, f"features.transition{i}.norm", n)
            _conv(sd, f"features.transition{i}.conv", n // 2, n, 1)
            n //= 2
    _bn(sd, "features.norm5", n)
    return sd


MBV2_CFGS = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
             (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]


def _fake_mobilenetv2_state():
    sd = {}
    _conv(sd, "features.0.0", 32, 3, 3)
    _bn(sd, "features.0.1", 32)
    idx, in_ch = 0, 32
    for t_ratio, c, reps, _s in MBV2_CFGS:
        for _b in range(reps):
            idx += 1
            base = f"features.{idx}.conv"
            hidden = in_ch * t_ratio
            if t_ratio == 1:
                _conv(sd, f"{base}.0.0", hidden, 1, 3)  # dw: OIHW I=1
                _bn(sd, f"{base}.0.1", hidden)
                _conv(sd, f"{base}.1", c, hidden, 1)
                _bn(sd, f"{base}.2", c)
            else:
                _conv(sd, f"{base}.0.0", hidden, in_ch, 1)
                _bn(sd, f"{base}.0.1", hidden)
                _conv(sd, f"{base}.1.0", hidden, 1, 3)  # dw
                _bn(sd, f"{base}.1.1", hidden)
                _conv(sd, f"{base}.2", c, hidden, 1)
                _bn(sd, f"{base}.3", c)
            in_ch = c
    _conv(sd, "features.18.0", 1280, 320, 1)
    _bn(sd, "features.18.1", 1280)
    return sd


def _torch_stem_bn_relu(x_nchw, w, bn_prefix, sd, stride, pad, relu6=False):
    y = F.conv2d(x_nchw, w, stride=stride, padding=pad)
    y = F.batch_norm(
        y,
        sd[f"{bn_prefix}.running_mean"],
        sd[f"{bn_prefix}.running_var"],
        sd[f"{bn_prefix}.weight"],
        sd[f"{bn_prefix}.bias"],
        training=False,
        eps=1e-5,
    )
    return torch.clamp(y, 0, 6) if relu6 else torch.relu(y)


def test_densenet121_convert_inject_stem_parity(rng, tmp_path):
    sd = _fake_densenet121_state()
    params, stats = convert_torch_densenet(sd, (6, 12, 24, 16))
    assert params["conv0"]["kernel"].shape == (7, 7, 3, 64)
    assert params["dense3_23"]["conv2"]["kernel"].shape == (3, 3, 128, 32)
    assert stats["norm5"]["mean"].shape == (1024,)

    enc = DenseNetEncoder(block_config=(6, 12, 24, 16), growth_rate=32,
                          num_init_features=64)
    img = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), img, train=False)

    path = tmp_path / "densenet121.pth"
    torch.save(sd, str(path))
    injected = load_pretrained_encoder(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        encoder_path=(), num_layers="densenet121", weights_file=str(path),
    )
    np.testing.assert_allclose(
        np.asarray(injected["params"]["conv0"]["kernel"]),
        np.transpose(sd["features.conv0.weight"].numpy(), (2, 3, 1, 0)),
        atol=1e-6,
    )

    feats = enc.apply(
        {"params": injected["params"], "batch_stats": injected["batch_stats"]},
        img, train=False,
    )
    assert len(feats) == 5 and feats[-1].shape[-1] == 1024

    # stem (relu0 tap) parity vs torch ops
    x_t = torch.from_numpy(np.transpose(np.asarray(img), (0, 3, 1, 2)))
    ref = _torch_stem_bn_relu(
        x_t, sd["features.conv0.weight"], "features.norm0", sd, 2, 3
    )
    np.testing.assert_allclose(
        np.asarray(feats[0]),
        np.transpose(ref.numpy(), (0, 2, 3, 1)),
        atol=2e-4,
    )


def test_mobilenetv2_convert_inject_stem_parity(rng, tmp_path):
    sd = _fake_mobilenetv2_state()
    params, stats = convert_torch_mobilenetv2(sd)
    assert params["stem"]["kernel"].shape == (3, 3, 3, 32)
    assert "expand" not in params["ir1"]  # expand_ratio 1
    assert params["ir2"]["expand"]["kernel"].shape == (1, 1, 16, 96)
    assert params["ir17"]["project"]["kernel"].shape == (1, 1, 960, 320)
    assert params["ir17"]["dw"]["kernel"].shape == (3, 3, 1, 960)
    assert stats["bn_head"]["mean"].shape == (1280,)

    enc = MobileNetV2Encoder()
    img = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), img, train=False)

    path = tmp_path / "mobilenet_v2.pth"
    torch.save(sd, str(path))
    injected = load_pretrained_encoder(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        encoder_path=(), num_layers="mobilenet_v2", weights_file=str(path),
    )
    feats = enc.apply(
        {"params": injected["params"], "batch_stats": injected["batch_stats"]},
        img, train=False,
    )
    assert len(feats) == 5 and feats[-1].shape[-1] == 1280

    # stem + first (dw) inverted-residual parity vs torch ops
    x_t = torch.from_numpy(np.transpose(np.asarray(img), (0, 3, 1, 2)))
    y = _torch_stem_bn_relu(
        x_t, sd["features.0.0.weight"], "features.0.1", sd, 2, 1, relu6=True
    )
    y = F.conv2d(y, sd["features.1.conv.0.0.weight"], stride=1, padding=1, groups=32)
    y = F.batch_norm(
        y, sd["features.1.conv.0.1.running_mean"],
        sd["features.1.conv.0.1.running_var"],
        sd["features.1.conv.0.1.weight"], sd["features.1.conv.0.1.bias"],
        training=False, eps=1e-5,
    )
    y = torch.clamp(y, 0, 6)
    y = F.conv2d(y, sd["features.1.conv.1.weight"])
    y = F.batch_norm(
        y, sd["features.1.conv.2.running_mean"],
        sd["features.1.conv.2.running_var"],
        sd["features.1.conv.2.weight"], sd["features.1.conv.2.bias"],
        training=False, eps=1e-5,
    )
    # ir1 output parity: the encoder only exposes tap indices 1/3/6/10/18,
    # so rebuild stem+ir1 with the converted params and compare numerically
    import flax.linen as fnn

    class StemIR1(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            x = fnn.Conv(32, (3, 3), strides=(2, 2), padding=1, use_bias=False, name="stem")(x)
            x = fnn.relu6(fnn.BatchNorm(use_running_average=True, name="bn_stem")(x))
            from simpledepthestimation_tpu.models.encoders import InvertedResidual

            return InvertedResidual(16, stride=1, expand_ratio=1, name="ir1")(x, train=False)

    sub_params = {k: injected["params"][k] for k in ("stem", "bn_stem", "ir1")}
    sub_stats = {k: injected["batch_stats"][k] for k in ("bn_stem", "ir1")}
    ir1_out = StemIR1().apply(
        {"params": sub_params, "batch_stats": sub_stats}, img
    )
    np.testing.assert_allclose(
        np.asarray(ir1_out), np.transpose(y.numpy(), (0, 2, 3, 1)), atol=2e-4
    )
