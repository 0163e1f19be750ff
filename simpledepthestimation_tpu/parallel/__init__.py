from .mesh import (
    build_mesh,
    data_sharding,
    is_multiprocess_mesh,
    local_batch_size,
    replicated,
    shard_batch,
)
from .train_step import (
    TrainState,
    create_train_state,
    host_local_tree,
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
    "host_local_tree",
    "is_multiprocess_mesh",
]
