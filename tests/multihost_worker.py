"""Worker entry for the 2-process multi-host simulation test
(tests/test_multihost.py). Runs on CPU with jax.distributed over a
localhost coordinator and exercises comm.all_gather / reduce_dict /
shared_random_seed and the evaluator's cross-process metric gather
(reference detectron2/utils/comm.py:139-263 +
evaluation/depth_evaluation.py:104-131 analog).

Usage: python multihost_worker.py <process_id> <num_processes> <coordinator>
"""

import os
import sys


def main():
    proc_id, num_procs, coordinator = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

    import jax

    # the axon TPU plugin ignores JAX_PLATFORMS in this image (see
    # tests/conftest.py) — force CPU through jax.config before any backend
    # initialization
    jax.config.update("jax_platforms", "cpu")

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_procs,
        process_id=proc_id,
    )

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from simpledepthestimation_tpu.utils import comm

    assert comm.get_world_size() == num_procs, comm.get_world_size()
    assert comm.get_rank() == proc_id

    # object all_gather (variable payload sizes per rank)
    payload = {"rank": proc_id, "blob": "x" * (10 + proc_id * 100)}
    gathered = comm.all_gather(payload)
    assert [g["rank"] for g in gathered] == list(range(num_procs)), gathered
    assert len(gathered[1]["blob"]) == 110

    # reduce_dict mean across ranks: (1 + 2)/2 = 1.5
    reduced = comm.reduce_dict({"loss": float(proc_id + 1)})
    if comm.is_main_process():
        assert abs(reduced["loss"] - 1.5) < 1e-9, reduced

    # shared seed agrees everywhere
    seed = comm.shared_random_seed()
    seeds = comm.all_gather(seed)
    assert len(set(seeds)) == 1, seeds

    # evaluator cross-process metric gather: each rank contributes one
    # distinguishable metric row; rank 0 must see both
    import numpy as np
    from simpledepthestimation_tpu.config import get_cfg
    from simpledepthestimation_tpu.evaluation.depth_evaluation import kitti_evaluator

    cfg = get_cfg()
    evaluator = kitti_evaluator(cfg, output_folder=None)
    assert evaluator._distributed
    evaluator.reset()
    # a fabricated 9-metric row whose abs_rel encodes the rank
    row = tuple(np.full(9, float(proc_id)))
    evaluator.metrics = [row]
    results = evaluator.evaluate()
    if comm.is_main_process():
        # mean of rank rows 0 and 1 → 0.5 in every column
        vals = results["kitti evaluator"]
        assert abs(vals["abs_rel"] - 0.5) < 1e-9, results
        print("MULTIHOST_OK", flush=True)
    else:
        assert results == {}

    comm.synchronize("done")


if __name__ == "__main__":
    main()
