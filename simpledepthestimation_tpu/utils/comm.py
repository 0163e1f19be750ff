"""Cross-process (multi-host) communication helpers.

TPU-native re-design of reference detectron2/utils/comm.py:21-263. The
reference runs one process per GPU with NCCL + a gloo side group; here we run
SPMD JAX — one process per *host*, each owning several chips. Gradient
all-reduce is not here at all: it happens inside the jitted train step via
sharding-induced psum over ICI. What remains host-side is:

- rank/world bookkeeping (``jax.process_index`` / ``process_count``)
- object gather for metric rows (the gloo-analog), via
  ``multihost_utils.process_allgather`` on serialized payloads
- barrier (``sync_global_devices``)
- shared random seed across processes

Every function degrades to a no-op at world size 1, matching the
reference's degenerate single-process path (comm.py:21-27).
"""

from __future__ import annotations

import pickle
from typing import Any, List

import numpy as np

import jax


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return get_rank() == 0


def get_local_rank() -> int:
    # one process per host: local rank is always 0 within the host
    return 0


def synchronize(name: str = "barrier") -> None:
    """Barrier across all processes."""
    if get_world_size() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def all_gather(data: Any) -> List[Any]:
    """Gather an arbitrary picklable object from every process.

    The reference does this with a gloo group (comm.py:139-174); here the
    pickled payload rides a device all-gather of padded uint8 buffers.
    """
    if get_world_size() == 1:
        return [data]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(data), dtype=np.uint8)
    local_size = np.array([payload.size], dtype=np.int64)
    sizes = multihost_utils.process_allgather(local_size).reshape(-1)
    max_size = int(sizes.max())
    padded = np.zeros((max_size,), dtype=np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(gathered[i, : int(sizes[i])].tobytes())
        for i in range(get_world_size())
    ]


def gather(data: Any, dst: int = 0) -> List[Any]:
    """Gather to one process (others get []). JAX multihost collectives are
    symmetric, so this all-gathers and discards elsewhere."""
    result = all_gather(data)
    return result if get_rank() == dst else []


def shared_random_seed() -> int:
    """A random seed agreed upon by all processes (reference comm.py:220-231)."""
    seed = int(np.random.randint(2**31))
    return int(all_gather(seed)[0])


def reduce_dict(input_dict: dict, average: bool = True) -> dict:
    """Mean/sum-reduce a dict of scalars across processes (reference comm.py:234-263)."""
    if get_world_size() == 1:
        return dict(input_dict)
    keys = sorted(input_dict.keys())
    values = np.array([float(np.asarray(input_dict[k])) for k in keys], dtype=np.float64)
    rows = np.stack(all_gather(values))
    reduced = rows.mean(0) if average else rows.sum(0)
    return {k: float(v) for k, v in zip(keys, reduced)}
