"""Engine tests: events/writers, hooks, config compat, auto_scale_workers,
checkpointer round-trip."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simpledepthestimation_tpu.config import CfgNode, get_cfg
from simpledepthestimation_tpu.config.compat import (
    upgrade_config,
    downgrade_config,
    guess_version,
)
from simpledepthestimation_tpu.utils.events import (
    EventStorage,
    JSONWriter,
    CommonMetricPrinter,
    get_event_storage,
    HistoryBuffer,
)


def test_history_buffer():
    hb = HistoryBuffer()
    for i in range(10):
        hb.update(float(i))
    assert hb.latest() == 9.0
    assert hb.avg(4) == np.mean([6, 7, 8, 9])
    assert hb.median(10) == 4.5
    assert hb.global_avg() == 4.5


def test_event_storage_scoping():
    with EventStorage(0) as s:
        s.put_scalar("a", 1.0)
        assert get_event_storage() is s
        with EventStorage(5) as inner:
            assert get_event_storage() is inner
        assert get_event_storage() is s
    with pytest.raises(AssertionError):
        get_event_storage()


def test_event_storage_smoothing():
    with EventStorage(0) as s:
        for i in range(30):
            s.iter = i
            s.put_scalar("loss", float(i))
            s.put_scalar("lr", float(i), smoothing_hint=False)
        latest = s.latest_with_smoothing_hint(window_size=20)
        assert latest["lr"][0] == 29.0  # unsmoothed
        assert latest["loss"][0] == np.median(np.arange(10, 30))


def test_json_writer(tmp_path):
    path = str(tmp_path / "metrics.json")
    with EventStorage(0) as s:
        writer = JSONWriter(path, window_size=1)
        for i in range(3):
            s.iter = i
            s.put_scalar("loss", float(i))
            writer.write()
        writer.close()
    rows = [json.loads(l) for l in open(path)]
    assert [r["loss"] for r in rows] == [0.0, 1.0, 2.0]
    assert rows[-1]["iteration"] == 2


def test_name_scope():
    with EventStorage(0) as s:
        with s.name_scope("val"):
            s.put_scalar("abs_rel", 0.1)
        assert "val/abs_rel" in s.latest()


def test_put_image_with_cmap():
    with EventStorage(0) as s:
        s.put_image_with_cmap("disp", np.random.rand(10, 12))
        name, img, it = s._vis_data[0]
        assert img.shape == (10, 12, 3) and img.dtype == np.uint8


def test_config_version_roundtrip():
    cfg = get_cfg()
    assert cfg.VERSION == 2
    down = downgrade_config(cfg, 1)
    assert down.VERSION == 1
    assert "NAME" in down.DATASETS  # flattened
    up = upgrade_config(down, 2)
    assert up.VERSION == 2
    assert "NAME" in up.DATASETS.TRAIN


def test_guess_version():
    cfg = CfgNode({"DATASETS": {"TRAIN": {"NAME": "x"}}})
    assert guess_version(cfg) == 2
    cfg = CfgNode({"DATASETS": {"NAME": "x"}})
    assert guess_version(cfg) == 1


def test_auto_scale_workers():
    from simpledepthestimation_tpu.engine.trainer import DefaultTrainer

    cfg = get_cfg()
    cfg.SOLVER.REFERENCE_WORLD_SIZE = 2
    cfg.SOLVER.IMS_PER_BATCH = 16
    cfg.SOLVER.DEPTH_LR = 1e-4
    scaled = DefaultTrainer.auto_scale_workers(cfg, 8)
    assert scaled.SOLVER.IMS_PER_BATCH == 64
    np.testing.assert_allclose(scaled.SOLVER.DEPTH_LR, 4e-4)
    assert scaled.SOLVER.REFERENCE_WORLD_SIZE == 8
    # no-op when reference is 0
    cfg2 = get_cfg()
    assert DefaultTrainer.auto_scale_workers(cfg2, 8) is cfg2


def test_checkpointer_roundtrip(tmp_path):
    import optax

    from simpledepthestimation_tpu.engine.checkpoint import Checkpointer
    from simpledepthestimation_tpu.parallel import TrainState

    opt = optax.adam(1e-3)
    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    state = TrainState(
        step=jnp.asarray(7),
        params=params,
        batch_stats={},
        opt_state=opt.init(params),
    )
    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save(epoch=3, state=state)
    assert ckpt.has_checkpoint()

    zero_state = TrainState(
        step=jnp.asarray(0),
        params={"w": jnp.zeros((2, 3))},
        batch_stats={},
        opt_state=opt.init(params),
    )
    restored, start_epoch = ckpt.resume_or_load("", zero_state, resume=True)
    assert start_epoch == 4
    np.testing.assert_allclose(np.asarray(restored.params["w"]), np.arange(6.0).reshape(2, 3))
    assert int(restored.step) == 7

    # resume=False + no weights → untouched
    same, epoch0 = ckpt.resume_or_load("", zero_state, resume=False)
    assert epoch0 == 0
    np.testing.assert_allclose(np.asarray(same.params["w"]), 0.0)


def test_hooks_fire_in_order():
    from simpledepthestimation_tpu.engine.train_loop import TrainerBase, HookBase

    calls = []

    class Recorder(HookBase):
        def before_train(self):
            calls.append("bt")

        def before_step(self):
            calls.append("bs")

        def after_step(self):
            calls.append("as")

        def after_train(self):
            calls.append("at")

    class TinyTrainer(TrainerBase):
        def run_step(self):
            calls.append(f"run{self.iter}")

    t = TinyTrainer()
    t.register_hooks([Recorder()])
    t.train(0, 2)
    assert calls == ["bt", "bs", "run0", "as", "bs", "run1", "as", "at"]


def test_partial_restore_eval_template(tmp_path):
    """--eval of a self-supervised run: the eval-time state (inference init,
    no pose_net) must restore the depth-net subtree from a full train
    checkpoint non-strictly (reference fvcore Checkpointer semantics)."""
    import jax.numpy as jnp

    from simpledepthestimation_tpu.engine.checkpoint import Checkpointer
    from simpledepthestimation_tpu.parallel import TrainState

    full = TrainState(
        step=jnp.asarray(5, jnp.int32),
        params={
            "depth_net": {"w": jnp.full((3,), 7.0)},
            "pose_net": {"w": jnp.full((2,), 2.0)},
        },
        batch_stats={"depth_net": {"bn": {"mean": jnp.full((3,), 0.5)}}},
        opt_state=(jnp.zeros((1,)),),
    )
    ck = Checkpointer(str(tmp_path / "ckpt"))
    ck.save(0, full)

    eval_state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params={"depth_net": {"w": jnp.zeros((3,))}},
        batch_stats={"depth_net": {"bn": {"mean": jnp.zeros((3,))}}},
        opt_state=None,
    )
    restored, start_epoch = ck.resume_or_load("", eval_state, resume=True)
    assert start_epoch == 1
    np.testing.assert_allclose(np.asarray(restored.params["depth_net"]["w"]), 7.0)
    np.testing.assert_allclose(
        np.asarray(restored.batch_stats["depth_net"]["bn"]["mean"]), 0.5
    )
    assert "pose_net" not in restored.params
