from .registry import Registry
from .logger import setup_logger, log_every_n_seconds, log_first_n
from .events import (
    EventStorage,
    get_event_storage,
    has_event_storage,
    JSONWriter,
    TensorboardWriter,
    CommonMetricPrinter,
)
from .env import seed_all_rng, collect_env_info
from . import comm

__all__ = [
    "Registry",
    "setup_logger",
    "log_every_n_seconds",
    "log_first_n",
    "EventStorage",
    "get_event_storage",
    "has_event_storage",
    "JSONWriter",
    "TensorboardWriter",
    "CommonMetricPrinter",
    "seed_all_rng",
    "collect_env_info",
    "comm",
]
