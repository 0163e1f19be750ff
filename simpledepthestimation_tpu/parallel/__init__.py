from .mesh import build_mesh, data_sharding, replicated, shard_batch, local_batch_size
from .train_step import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
    place_replicated,
)

__all__ = [
    "build_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "local_batch_size",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "place_replicated",
]
