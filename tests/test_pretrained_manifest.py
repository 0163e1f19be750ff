"""Pretrained-weight manifest audit (no-egress substitute for a real load).

The checked-in asset ``models/assets/torchvision_manifests.json`` records
the canonical torchvision ``state_dict`` manifest (every key + shape) for
each ImageNet encoder the framework can warm-start (reference
detectron2/layers/resnet_encoder.py:82-86, BTSNet.py:278-333). This test
proves the converters in ``models/pretrained.py``:

1. consume EXACTLY the manifest's parameter keys — no missing keys (a
   converter silently skipping real weights) and no unexpected keys (a
   converter indexing keys a real torchvision file won't have), with only
   the classifier heads and BN ``num_batches_tracked`` bookkeeping
   deliberately ignored;
2. emit trees whose structure and leaf shapes match the live Flax encoder
   exactly, so the eventual real-weight load is a formality.

Real ImageNet values remain unobtainable here (zero egress, no
torchvision); re-generate the asset with
``tools/gen_pretrained_manifest.py --torchvision`` when available.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpledepthestimation_tpu.models import pretrained as P
from simpledepthestimation_tpu.models.encoders import (
    DenseNetEncoder,
    MobileNetV2Encoder,
    ResNeXtEncoder,
)
from simpledepthestimation_tpu.models.resnet import ResNetEncoder

ASSET = os.path.join(
    os.path.dirname(P.__file__), "assets", "torchvision_manifests.json"
)

with open(ASSET) as f:
    MANIFESTS = json.load(f)["manifests"]


class RecordingDict(dict):
    """state_dict stand-in that records which keys a converter reads."""

    def __init__(self, manifest, rng):
        super().__init__(
            {k: rng.standard_normal(shape).astype(np.float32) if shape else
             np.float32(rng.standard_normal())
             for k, shape in manifest.items()}
        )
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)


def _expected_consumed(manifest, head_prefixes):
    return {
        k
        for k in manifest
        if not k.endswith("num_batches_tracked")
        and not any(k.startswith(p) for p in head_prefixes)
    }


def _shapes(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict) or hasattr(v, "items"):
            out.update(_shapes(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(np.shape(v))
    return out


def _encoder_variables(module, hw=(64, 96)):
    x = jnp.zeros((1, hw[0], hw[1], 3), jnp.float32)
    return module.init(jax.random.PRNGKey(0), x, train=False)


CASES = {
    # arch: (converter, encoder module, classifier-head key prefixes)
    "resnet18": (
        lambda sd: P.convert_torch_resnet(sd, 18),
        ResNetEncoder(num_layers=18),
        ("fc.",),
    ),
    "resnet34": (
        lambda sd: P.convert_torch_resnet(sd, 34),
        ResNetEncoder(num_layers=34),
        ("fc.",),
    ),
    "resnet50": (
        lambda sd: P.convert_torch_resnet(sd, 50),
        ResNetEncoder(num_layers=50),
        ("fc.",),
    ),
    "resnet101": (
        lambda sd: P.convert_torch_resnet(sd, 101),
        ResNetEncoder(num_layers=101),
        ("fc.",),
    ),
    "resnext50_32x4d": (
        lambda sd: P.convert_torch_resnet(sd, 50),
        ResNeXtEncoder(blocks=(3, 4, 6, 3), groups=32, width_per_group=4),
        ("fc.",),
    ),
    "resnext101_32x8d": (
        lambda sd: P.convert_torch_resnet(sd, 101),
        ResNeXtEncoder(blocks=(3, 4, 23, 3), groups=32, width_per_group=8),
        ("fc.",),
    ),
    "densenet121": (
        lambda sd: P.convert_torch_densenet(sd, (6, 12, 24, 16)),
        DenseNetEncoder(block_config=(6, 12, 24, 16), growth_rate=32, num_init_features=64),
        ("classifier.",),
    ),
    "densenet161": (
        lambda sd: P.convert_torch_densenet(sd, (6, 12, 36, 24)),
        DenseNetEncoder(block_config=(6, 12, 36, 24), growth_rate=48, num_init_features=96),
        ("classifier.",),
    ),
    "mobilenet_v2": (
        P.convert_torch_mobilenetv2,
        MobileNetV2Encoder(),
        ("classifier.",),
    ),
}


@pytest.mark.parametrize("arch", sorted(CASES))
def test_converter_consumes_exact_manifest(arch):
    """Converter reads every real-weight key and nothing else."""
    manifest = MANIFESTS[arch]
    converter, module, head_prefixes = CASES[arch]
    sd = RecordingDict(manifest, np.random.default_rng(0))
    params, stats = converter(sd)

    expected = _expected_consumed(manifest, head_prefixes)
    missing = expected - sd.read
    unexpected = sd.read - set(manifest)
    assert not missing, f"{arch}: converter never reads {sorted(missing)[:8]}"
    assert not unexpected, f"{arch}: converter reads nonexistent {sorted(unexpected)[:8]}"
    # everything read is either expected or bookkeeping we could also use
    extra_read = sd.read - expected
    assert not extra_read, f"{arch}: converter reads ignored keys {sorted(extra_read)[:8]}"


@pytest.mark.parametrize("arch", sorted(CASES))
def test_converter_shapes_match_live_encoder(arch):
    """Converted (params, batch_stats) structure+shapes == the Flax module's."""
    manifest = MANIFESTS[arch]
    converter, module, _ = CASES[arch]
    sd = RecordingDict(manifest, np.random.default_rng(1))
    params, stats = converter(sd)

    variables = _encoder_variables(module)
    want_p = _shapes(variables["params"])
    want_s = _shapes(variables["batch_stats"])
    got_p = _shapes(params)
    got_s = _shapes(stats)
    assert got_p == want_p, (
        f"{arch} params mismatch:\n only-converted: "
        f"{sorted(set(got_p) - set(want_p))[:6]}\n only-live: "
        f"{sorted(set(want_p) - set(got_p))[:6]}\n shape-diffs: "
        f"{[(k, got_p[k], want_p[k]) for k in set(got_p) & set(want_p) if got_p[k] != want_p[k]][:6]}"
    )
    assert got_s == want_s


def test_convs_only_converter_subset():
    """GoogleResNet's strict=False load (GoogleResNet.py:38-53): conv kernels
    only, a strict subset of the live NormResNetEncoder tree."""
    from simpledepthestimation_tpu.models.google_resnet import NormResNetEncoder

    manifest = MANIFESTS["resnet18"]
    sd = RecordingDict(manifest, np.random.default_rng(2))
    params = P.convert_torch_resnet_convs_only(sd, 18)

    expected = {
        k
        for k in manifest
        if k.endswith(".weight")
        and (".conv" in k or k.startswith("conv") or ".downsample.0." in k)
    }
    assert sd.read == expected, (sorted(sd.read - expected), sorted(expected - sd.read))

    variables = NormResNetEncoder(num_layers=18, norm="randLN").init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)), train=False
    )
    live = _shapes(variables["params"])
    got = _shapes(params)
    for k, shape in got.items():
        assert k in live and live[k] == shape, (k, shape, live.get(k))


def test_bts_convertible_covers_manifest_archs():
    """Every BTS encoder's torchvision stem resolves to a manifest entry."""
    for enc, (stem, spec) in P.BTS_CONVERTIBLE.items():
        assert stem in MANIFESTS, (enc, stem)
