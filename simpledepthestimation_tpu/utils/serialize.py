"""Picklable wrappers for closures/lambdas shipped to worker threads or
spawned processes (reference detectron2/utils/serialize.py)."""

from __future__ import annotations

import pickle
from typing import Any, Callable

try:
    import cloudpickle  # optional; falls back to pickle

    _dumps, _loads = cloudpickle.dumps, cloudpickle.loads
except ImportError:  # pragma: no cover
    _dumps, _loads = pickle.dumps, pickle.loads


class PicklableWrapper:
    """Wrap an arbitrary callable so it pickles via cloudpickle (supports
    lambdas/closures that plain pickle rejects)."""

    def __init__(self, obj: Callable):
        self._obj = obj

    def __reduce__(self):
        return (_unpickle_wrapped, (_dumps(self._obj),))

    def __call__(self, *args, **kwargs) -> Any:
        return self._obj(*args, **kwargs)

    def __getattr__(self, attr: str) -> Any:
        if attr != "_obj":
            return getattr(self._obj, attr)
        return super().__getattribute__(attr)


def _unpickle_wrapped(payload: bytes) -> PicklableWrapper:
    return PicklableWrapper(_loads(payload))
