"""Worker entry for the 8-process multi-host END-TO-END drive
(tests/test_multihost.py::test_eight_process_train_eval_resume).

Unlike multihost_worker.py (comm primitives only), this runs the real
training system at world N × 1 CPU device per process — the analog of the
reference's per-GPU launch (reference detectron2/engine/launch.py:24-94):

  auto_scale_workers → do_train (1 epoch, periodic eval + checkpoint)
  → standalone do_test (loads the checkpoint) → do_train(resume=True)
  for a second epoch.

Rank 0 writes a JSON record (per-step losses, eval metrics, final param
norm) that the host test compares against the identical single-process
8-device run: the sampler is rank-strided and the per-sample preprocess RNG
is keyed by dataset index, so the global batch stream is identical and the
SPMD step must produce the same numbers.

Usage: python multihost_e2e_worker.py <proc_id> <num_procs> <coordinator> <workdir>
"""

import json
import os
import sys


def main():
    proc_id, num_procs = int(sys.argv[1]), int(sys.argv[2])
    coordinator, workdir = sys.argv[3], sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=num_procs, process_id=proc_id
    )
    assert len(jax.devices()) == num_procs
    assert len(jax.local_devices()) == 1

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import numpy as np

    from simpledepthestimation_tpu.engine.runtime import do_test, do_train
    from simpledepthestimation_tpu.engine.trainer import DefaultTrainer
    from simpledepthestimation_tpu.parallel import host_local_tree
    from simpledepthestimation_tpu.utils import comm
    from tests.test_multihost import e2e_cfg  # single source of the cfg

    cfg = e2e_cfg(os.path.join(workdir, "out"))

    # linear-scaling rule at world N (reference defaults.py:553-622):
    # REFERENCE_WORLD_SIZE=4 → IMS_PER_BATCH 4→8, DEPTH_LR 5e-5→1e-4
    cfg = DefaultTrainer.auto_scale_workers(cfg, comm.get_world_size())
    assert cfg.SOLVER.IMS_PER_BATCH == 8, cfg.SOLVER.IMS_PER_BATCH
    assert abs(cfg.SOLVER.DEPTH_LR - 1e-4) < 1e-12, cfg.SOLVER.DEPTH_LR
    cfg.freeze()

    losses = []
    state = do_train(
        cfg,
        resume=False,
        metrics_tap=lambda it, m: losses.append((it, m["total_loss"])),
    )
    assert state is not None and int(state.step) == 2  # 16 / global batch 8

    # standalone eval: fresh init + latest-checkpoint load, per-rank shards
    results = do_test(cfg)
    if comm.is_main_process():
        assert "kitti evaluator" in results, results
    comm.synchronize("post-eval")

    # resume for a second epoch (start_epoch from the checkpoint meta)
    cfg2 = cfg.clone()
    cfg2.defrost()
    cfg2.SOLVER.MAX_EPOCHS = 2
    cfg2.freeze()
    state = do_train(
        cfg2,
        resume=True,
        metrics_tap=lambda it, m: losses.append((it, m["total_loss"])),
    )
    assert int(state.step) == 4, int(state.step)

    params = host_local_tree(state.params)
    param_norm = float(
        np.sqrt(
            sum(float(np.sum(np.square(x))) for x in jax.tree_util.tree_leaves(params))
        )
    )

    if comm.is_main_process():
        record = {
            "losses": losses,
            "eval": {k: float(v) for k, v in results["kitti evaluator"].items()},
            "param_norm": param_norm,
        }
        with open(os.path.join(workdir, "rank0.json"), "w") as f:
            json.dump(record, f)
        print("MULTIHOST_E2E_OK", flush=True)
    comm.synchronize("done")


if __name__ == "__main__":
    main()
