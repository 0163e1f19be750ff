#!/usr/bin/env python
"""Generate the torchvision pretrained-weight manifest asset.

Records, for every ImageNet encoder architecture the framework can warm-start
(reference detectron2/layers/resnet_encoder.py:82-86 "pt" suffix,
BTSNet.py:281-328 encoder zoo), the canonical torchvision ``state_dict``
manifest: every key and its tensor shape. The asset
(``simpledepthestimation_tpu/models/assets/torchvision_manifests.json``)
lets ``tests/test_pretrained_manifest.py`` audit the converters in
``models/pretrained.py`` — each converter must consume exactly the
manifest's parameter keys (minus the documented classifier-head /
bookkeeping keys) and emit a tree whose leaf shapes match the live encoder.

Ground truth here is the state-dict-compatible torchvision re-creations in
``tests/reference_compat.py`` (this image has no torchvision and no
egress); their key layout is what the parity harness already loads the
reference's own modules through. Re-run against real torchvision when
available:

    python tools/gen_pretrained_manifest.py [--torchvision]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, REPO)

ARCHS = [
    "resnet18",
    "resnet34",
    "resnet50",
    "resnet101",
    "resnext50_32x4d",
    "resnext101_32x8d",
    "densenet121",
    "densenet161",
    "mobilenet_v2",
]

OUT = os.path.join(
    REPO, "simpledepthestimation_tpu", "models", "assets", "torchvision_manifests.json"
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--torchvision",
        action="store_true",
        help="use a real installed torchvision instead of the test stand-ins",
    )
    args = ap.parse_args()

    if args.torchvision:
        import torchvision.models as models
    else:
        from reference_compat import install_reference_environment

        install_reference_environment()
        import torchvision.models as models

    manifests = {}
    for arch in ARCHS:
        sd = getattr(models, arch)(pretrained=False).state_dict()
        manifests[arch] = {k: list(v.shape) for k, v in sd.items()}
        print(f"{arch}: {len(sd)} keys")

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(
            {
                "source": "torchvision" if args.torchvision else "reference_compat stand-ins",
                "manifests": manifests,
            },
            f,
            indent=1,
            sort_keys=True,
        )
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
