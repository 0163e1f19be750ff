"""Every shipped project yaml must parse, merge over defaults, and build its
model graph (catches config/schema drift across the zoo)."""

import glob
import os

import pytest

from simpledepthestimation_tpu.config import get_cfg
from simpledepthestimation_tpu.models import build_model

REPO = os.path.join(os.path.dirname(__file__), "..")
CONFIGS = sorted(
    p
    for p in glob.glob(os.path.join(REPO, "projects", "*", "configs", "*.yaml"))
    if not os.path.basename(p).startswith("Base")
)


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: "/".join(p.split("/")[-3:]))
def test_config_builds_model(path):
    cfg = get_cfg()
    cfg.merge_from_file(path)
    cfg.freeze()
    assert cfg.MODEL.META_ARCHITECTURE
    model = build_model(cfg)
    assert model is not None
    # every non-synthetic config names the reference evaluator suite
    if "synthetic" not in path:
        assert "kitti_evaluator" in cfg.EVALUATORS


def test_all_configs_found():
    # guards against the glob silently matching nothing
    names = {os.path.basename(p) for p in CONFIGS}
    assert {"resnet18.yaml", "bts_r50.yaml", "packnet_1a.yaml", "synthetic_quick.yaml"} <= names
    assert len(CONFIGS) >= 9


def test_numeric_encoder_name_override():
    """CLI `MODEL.DEPTH_NET.ENCODER_NAME 18` literal-parses to an int; the
    depth-net builders must coerce instead of crashing."""
    from simpledepthestimation_tpu.config import get_cfg
    from simpledepthestimation_tpu.models import build_depth_net

    cfg = get_cfg()
    cfg.MODEL.DEPTH_NET.NAME = "DepthResNet"
    cfg.merge_from_list(["MODEL.DEPTH_NET.ENCODER_NAME", "18"])
    assert build_depth_net(cfg) is not None

    cfg2 = get_cfg()
    cfg2.MODEL.DEPTH_NET.NAME = "GoogleResNet"
    cfg2.merge_from_list(["MODEL.DEPTH_NET.ENCODER_NAME", "18"])
    assert build_depth_net(cfg2) is not None


def test_flags_after_opts_clear_error():
    """argparse REMAINDER swallows flags placed after KEY VALUE overrides;
    assemble_cfg must fail with an actionable message instead of an opaque
    odd-length assert."""
    import pytest as _pytest

    from simpledepthestimation_tpu.engine import default_argument_parser
    from simpledepthestimation_tpu.engine.defaults import assemble_cfg

    args = default_argument_parser().parse_args(
        ["--cfg", "", "SOLVER.MAX_EPOCHS", "4", "--resume"]
    )
    with _pytest.raises(SystemExit, match="BEFORE the trailing"):
        assemble_cfg(args)


def test_double_dash_separator_accepted():
    """A literal '--' POSIX separator before the KEY VALUE overrides must
    not trip the misplaced-flags guard."""
    from simpledepthestimation_tpu.engine import default_argument_parser
    from simpledepthestimation_tpu.engine.defaults import assemble_cfg

    args = default_argument_parser().parse_args(
        ["--cfg", "", "--resume", "--", "SOLVER.MAX_EPOCHS", "4"]
    )
    cfg = assemble_cfg(args)
    assert cfg.SOLVER.MAX_EPOCHS == 4
