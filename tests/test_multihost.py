"""Two-process multi-host simulation (VERDICT r1 item 8): spawn 2 CPU
processes with ``jax.distributed.initialize`` over a localhost coordinator
and verify comm.all_gather / reduce_dict / shared_random_seed and the
evaluator's cross-process metric gather at world_size 2
(reference detectron2/utils/comm.py:139-263)."""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def e2e_cfg(output_dir: str):
    """Shared config for the world-8 e2e drive and its single-process
    8-device control run: SyntheticDepth supervised ResNet18 at 64×96,
    deterministic preprocess (per-sample RNG is keyed by dataset index, so
    the stream is world-size-invariant). REFERENCE_WORLD_SIZE=4 so
    auto_scale_workers(·, 8) doubles batch/LR in both runs."""
    from simpledepthestimation_tpu.config import CfgNode, get_cfg

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "SupDepthModel"
    cfg.MODEL.DEPTH_NET.NAME = "DepthResNet"
    cfg.MODEL.DEPTH_NET.ENCODER_NAME = "18"
    cfg.MODEL.DEPTH_NET.UPSAMPLE_DEPTH = False
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.LOSS.VARIANCE_FOCUS = 0.85
    for split, length in (("TRAIN", 16), ("TEST", 8)):
        ds = cfg.DATASETS[split]
        ds.NAME = "SyntheticDepth"
        ds.LENGTH = length
        ds.IMG_HEIGHT = 64
        ds.IMG_WIDTH = 96
    cfg.DATASETS.TRAIN.PREPROCESS = [CfgNode({"NAME": "ToTensor"})]
    cfg.DATASETS.TEST.PREPROCESS = [CfgNode({"NAME": "ToTensor"})]
    cfg.SOLVER.IMS_PER_BATCH = 4
    cfg.SOLVER.REFERENCE_WORLD_SIZE = 4
    cfg.SOLVER.OPT = "adamw_poly"
    cfg.SOLVER.DEPTH_LR = 5e-5
    cfg.SOLVER.MAX_EPOCHS = 1
    cfg.SOLVER.CHECKPOINT_PERIOD = 1
    cfg.DATALOADER.NUM_WORKERS = 0
    cfg.TEST.EVAL_PERIOD = 1
    cfg.TEST.GT_SCALE = False
    cfg.EVALUATORS = ("kitti_evaluator",)
    cfg.OUTPUT_DIR = output_dir
    cfg.SEED = 0
    cfg.LOG_PERIOD = 1
    cfg.VIS_PERIOD = 0
    return cfg


def test_two_process_comm_and_metric_gather():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "multihost_worker.py")
    coordinator = f"127.0.0.1:{_free_port()}"

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", coordinator],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=repo,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=360)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
    # rank 0 saw both metric rows (mean 0.5 across ranks 0 and 1)
    assert "MULTIHOST_OK" in outs[0]


@pytest.mark.slow
def test_eight_process_train_eval_resume(tmp_path):
    """World-8 end-to-end drive of the real training system (VERDICT r2
    item 5): 8 processes × 1 CPU device each run auto_scale_workers →
    do_train (epoch 0, periodic eval + checkpoint) → standalone do_test →
    do_train(resume=True) for epoch 1 — the analog of the reference's
    multi-process launch path (reference detectron2/engine/launch.py:24-94).

    The rank-strided sampler + index-keyed preprocess RNG make the global
    batch stream identical to the single-process 8-device run, so the
    per-step losses, eval metrics, and final parameter norm must match the
    in-process control run to fp-reduction noise."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "multihost_e2e_worker.py")
    coordinator = f"127.0.0.1:{_free_port()}"
    world = 8
    workdir = str(tmp_path / "mh")
    os.makedirs(workdir)

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own (1 local device)
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(world), coordinator, workdir],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=repo,
        )
        for pid in range(world)
    ]

    # Control: the identical run on this process's 8 virtual devices.
    # Runs while the workers grind so wall-clock overlaps.
    import numpy as np

    from simpledepthestimation_tpu.engine.runtime import do_test, do_train
    from simpledepthestimation_tpu.engine.trainer import DefaultTrainer
    from simpledepthestimation_tpu.parallel import host_local_tree

    cfg = e2e_cfg(str(tmp_path / "ctrl"))
    cfg = DefaultTrainer.auto_scale_workers(cfg, world)
    cfg.freeze()
    ctrl_losses = []
    do_train(cfg, resume=False,
             metrics_tap=lambda it, m: ctrl_losses.append((it, m["total_loss"])))
    ctrl_eval = do_test(cfg)["kitti evaluator"]
    cfg2 = cfg.clone()
    cfg2.defrost()
    cfg2.SOLVER.MAX_EPOCHS = 2
    cfg2.freeze()
    state = do_train(cfg2, resume=True,
                     metrics_tap=lambda it, m: ctrl_losses.append((it, m["total_loss"])))
    params = host_local_tree(state.params)
    ctrl_norm = float(np.sqrt(sum(
        float(np.sum(np.square(x))) for x in __import__("jax").tree_util.tree_leaves(params)
    )))

    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=2400)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
    assert "MULTIHOST_E2E_OK" in outs[0]

    with open(os.path.join(workdir, "rank0.json")) as f:
        record = json.load(f)

    # per-step loss trajectory: same global batches through the same SPMD
    # program → equal to fp-reduction noise
    assert [it for it, _ in record["losses"]] == [it for it, _ in ctrl_losses]
    np.testing.assert_allclose(
        [v for _, v in record["losses"]], [v for _, v in ctrl_losses], rtol=1e-4
    )
    for k, v in ctrl_eval.items():
        np.testing.assert_allclose(record["eval"][k], float(v), rtol=1e-4, err_msg=k)
    np.testing.assert_allclose(record["param_norm"], ctrl_norm, rtol=1e-5)
