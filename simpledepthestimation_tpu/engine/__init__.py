from .defaults import (
    default_argument_parser,
    default_setup,
    default_writers,
    assemble_cfg,
    simple_main,
)
from .train_loop import HookBase, TrainerBase, SimpleTrainer
from . import hooks
from .checkpoint import Checkpointer, PeriodicCheckpointer, load_weights
from .runtime import do_train, do_test, build_mesh_from_cfg

__all__ = [
    "default_argument_parser",
    "default_setup",
    "default_writers",
    "assemble_cfg",
    "simple_main",
    "HookBase",
    "TrainerBase",
    "SimpleTrainer",
    "hooks",
    "Checkpointer",
    "PeriodicCheckpointer",
    "load_weights",
    "do_train",
    "do_test",
    "build_mesh_from_cfg",
]
