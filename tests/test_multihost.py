"""Two-process multi-host simulation (VERDICT r1 item 8): spawn 2 CPU
processes with ``jax.distributed.initialize`` over a localhost coordinator
and verify comm.all_gather / reduce_dict / shared_random_seed and the
evaluator's cross-process metric gather at world_size 2
(reference detectron2/utils/comm.py:139-263)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


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
