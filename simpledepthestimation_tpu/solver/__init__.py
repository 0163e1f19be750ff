from .build import (
    build_optimizer,
    poly_lr_schedule,
    multistep_lr_schedule,
    make_param_group_label_fn,
)

__all__ = [
    "build_optimizer",
    "poly_lr_schedule",
    "multistep_lr_schedule",
    "make_param_group_label_fn",
]
