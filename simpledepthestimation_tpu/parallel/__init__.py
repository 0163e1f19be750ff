from .mesh import build_mesh, data_sharding, replicated, shard_batch, local_batch_size
from .train_step import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
    place_replicated,
    compute_precise_bn_stats,
    make_precise_bn_fn,
)

__all__ = [
    "build_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "local_batch_size",
    "compute_precise_bn_stats",
    "make_precise_bn_fn",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "place_replicated",
]
