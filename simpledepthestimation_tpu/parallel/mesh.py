"""Device mesh construction and sharding helpers.

The TPU-native replacement for the reference's process-per-GPU NCCL runtime
(reference detectron2/engine/launch.py:24-94, utils/comm.py): one process per
host, SPMD over a ``jax.sharding.Mesh``. The default is a 1-D ``('data',)``
mesh (the reference's only parallelism is DDP — SURVEY.md §2.1); the mesh is
declared through cfg (``TPU.MESH_AXES``/``TPU.MESH_SHAPE``) so model axes can
be added without touching the train loop.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(
    axis_names: Sequence[str] = ("data",),
    shape: Sequence[int] = (0,),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a mesh over all (or the given) devices.

    A 0 in ``shape`` means "fill with however many devices remain"
    (np.reshape -1 semantics). Default: every device on one data axis.
    A fully-explicit shape smaller than the device count takes the first
    prod(shape) devices (e.g. MESH_SHAPE (1,) forces a single-device mesh
    on a multi-device host).
    """
    devices = list(devices if devices is not None else jax.devices())
    shape = [(-1 if s == 0 else int(s)) for s in shape]
    assert shape.count(-1) <= 1, "at most one free axis"
    if -1 not in shape:
        want = int(np.prod(shape))
        assert want <= len(devices), f"mesh shape {shape} needs {want} devices"
        devices = devices[:want]
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the 'data' axis: the DDP analog."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def is_multiprocess_mesh(mesh: Mesh) -> bool:
    """True when the mesh spans devices owned by other processes (the
    multi-host SPMD regime: reference launch.py runs one process per GPU;
    here one process per host, each addressing only its local devices)."""
    if jax.process_count() == 1:
        return False
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host-local numpy batch onto the mesh, sharded on dim 0.

    Single-host: ``jax.device_put`` with a NamedSharding splits the batch
    across local devices. Multi-host: each host owns a slice of the global
    batch; form the global array from the per-process shards (non-shardable
    leaves — per-step scalars etc., identical on every host — replicate).
    """
    sharding = data_sharding(mesh)
    if not is_multiprocess_mesh(mesh):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding if _shardable(x, mesh) else replicated(mesh)),
            batch,
        )
    from jax.experimental import multihost_utils

    def place(x):
        x = np.asarray(x)
        if _shardable_global(x, mesh):
            return jax.make_array_from_process_local_data(sharding, x)
        return multihost_utils.host_local_array_to_global_array(x, mesh, P())

    return jax.tree_util.tree_map(place, batch)


def _shardable(x, mesh: Mesh) -> bool:
    n = mesh.shape.get("data", 1)
    return hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] % n == 0


def _shardable_global(x, mesh: Mesh) -> bool:
    """Shardability of a PER-PROCESS piece of a global batch: the implied
    global dim-0 (local rows × processes in the mesh) must divide the data
    axis."""
    n = mesh.shape.get("data", 1)
    procs = len({d.process_index for d in mesh.devices.flat})
    return hasattr(x, "shape") and x.ndim >= 1 and (x.shape[0] * procs) % n == 0 and x.shape[0] > 0


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    """Per-host batch: IMS_PER_BATCH // num_hosts (reference data/build.py:74-92
    divides per GPU; here the per-host loader produces num_local_devices
    shards worth)."""
    assert global_batch % jax.process_count() == 0, (
        f"IMS_PER_BATCH={global_batch} must divide evenly among "
        f"{jax.process_count()} hosts"
    )
    return global_batch // jax.process_count()
