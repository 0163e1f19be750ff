"""Misc util tests: instantiate/configurable, movers, serialize, file_io,
comm degenerate paths, MotionLearning schedule ramps."""

import numpy as np
import pytest

import jax.numpy as jnp

from simpledepthestimation_tpu.config import CfgNode, instantiate, configurable
from simpledepthestimation_tpu.utils import comm
from simpledepthestimation_tpu.utils.memory import to_numpy, to_device
from simpledepthestimation_tpu.utils.serialize import PicklableWrapper
from simpledepthestimation_tpu.utils import file_io


def test_instantiate_target_dict():
    obj = instantiate(
        {"_target_": "collections.OrderedDict", "a": 1, "b": {"_target_": "builtins.list"}}
    )
    assert obj["a"] == 1 and obj["b"] == []


def test_configurable_classmethod():
    class Thing:
        @classmethod
        def from_config(cls, cfg):
            return {"x": cfg.X, "y": cfg.get("Y", 0)}

        @configurable
        def __init__(self, x, y=0):
            self.x, self.y = x, y

    t1 = Thing(CfgNode({"X": 3, "Y": 4}))
    assert (t1.x, t1.y) == (3, 4)
    t2 = Thing(7, y=8)
    assert (t2.x, t2.y) == (7, 8)


def test_comm_degenerate_single_process():
    assert comm.get_world_size() == 1
    assert comm.get_rank() == 0
    assert comm.is_main_process()
    comm.synchronize()  # no-op
    assert comm.all_gather({"a": 1}) == [{"a": 1}]
    assert comm.gather(5) == [5]
    d = comm.reduce_dict({"x": 2.0})
    assert d == {"x": 2.0}


def test_to_numpy_and_device():
    tree = {"a": jnp.ones((2, 2)), "b": [jnp.zeros(3), "keep"]}
    out = to_numpy(tree)
    assert isinstance(out["a"], np.ndarray)
    assert out["b"][1] == "keep"
    back = to_device(out)
    assert hasattr(back["a"], "devices")


def test_picklable_wrapper_lambda():
    import pickle

    w = PicklableWrapper(lambda x: x * 3)
    w2 = pickle.loads(pickle.dumps(w))
    assert w2(4) == 12


def test_file_io_scheme(tmp_path, monkeypatch):
    monkeypatch.setenv("SDE_TPU_MODEL_ZOO", str(tmp_path))
    p = file_io.get_local_path("sde-tpu://weights/r18.pth")
    assert p == str(tmp_path / "weights/r18.pth")
    assert file_io.get_local_path("/plain/path") == "/plain/path"


def test_motionlearning_schedules():
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from projects.MotionLearning.train import make_schedule_fn
    from simpledepthestimation_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.DEPTH_NET.NOISE_STDDEV = 0.5
    cfg.MODEL.DEPTH_NET.RAMPUP_ITERS = 100
    cfg.MODEL.POSE_NET.BURN_IN_ITERS = 200
    fn = make_schedule_fn(cfg)

    # fn(i) is called with the 0-based count of COMPLETED steps; schedules
    # follow the reference's pre-incremented global_step = i+1
    # (projects/MotionLearning/train.py:97-114, verified end-to-end by
    # tests/test_trajectory_parity.py::test_motionlearning_trajectory)
    s0 = fn(0)
    np.testing.assert_allclose(s0["noise_stddev"], 0.5 * 0.01**2, rtol=1e-6)
    assert s0["motion_weight"] == 0.0  # clip(2·1/200−1)<0→0
    s49 = fn(49)
    np.testing.assert_allclose(s49["noise_stddev"], 0.5 * 0.25, rtol=1e-6)  # (50/100)²·0.5
    s99 = fn(99)
    np.testing.assert_allclose(s99["noise_stddev"], 0.5, rtol=1e-6)
    np.testing.assert_allclose(s99["motion_weight"], 0.0)  # 2·100/200−1 = 0
    s199 = fn(199)
    np.testing.assert_allclose(s199["motion_weight"], 1.0)
    s1000 = fn(1000)
    np.testing.assert_allclose(s1000["noise_stddev"], 0.5)
    np.testing.assert_allclose(s1000["motion_weight"], 1.0)


def test_retry_if_oom():
    from simpledepthestimation_tpu.utils.memory import retry_if_oom

    calls = []

    @retry_if_oom
    def flaky():
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")
        return 42

    assert flaky() == 42 and len(calls) == 2

    @retry_if_oom
    def broken():
        raise ValueError("unrelated")

    import pytest as _pytest

    with _pytest.raises(ValueError):
        broken()


def test_event_storage_histogram_and_seed():
    import numpy as np

    from simpledepthestimation_tpu.utils.events import EventStorage
    from simpledepthestimation_tpu.utils.env import seed_all_rng

    with EventStorage(0) as s:
        s.put_histogram("h", np.arange(100.0))
        assert s._histograms  # binned data queued for the TB writer

    seed_all_rng(123)
    a = np.random.rand(3)
    seed_all_rng(123)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
