"""Colored process-0 console logging + per-process log files.

Capability parity with reference detectron2/utils/logger.py:37-109 in a
multi-host JAX setting: process 0 logs to stdout (colored when a tty),
every process can log to its own file.
"""

from __future__ import annotations

import atexit
import functools
import logging
import os
import sys
import time
from collections import Counter

_LOG_COUNTER: Counter = Counter()
_LOG_TIMER: dict = {}


class _ColorFormatter(logging.Formatter):
    COLORS = {"WARNING": "\033[33m", "ERROR": "\033[31m", "CRITICAL": "\033[31m"}

    def format(self, record):
        out = super().format(record)
        color = self.COLORS.get(record.levelname)
        if color and sys.stdout.isatty():
            out = color + out + "\033[0m"
        return out


@functools.lru_cache(maxsize=None)
def _cached_stream(filename: str):
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    io = open(filename, "a", buffering=1024)
    atexit.register(io.close)
    return io


def setup_logger(
    output: str | None = None,
    distributed_rank: int = 0,
    *,
    name: str = "simpledepthestimation_tpu",
    abbrev_name: str | None = None,
) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    if logger.handlers:
        return logger

    fmt = logging.Formatter(
        "[%(asctime)s] %(name)s %(levelname)s: %(message)s", datefmt="%m/%d %H:%M:%S"
    )

    if distributed_rank == 0:
        ch = logging.StreamHandler(stream=sys.stdout)
        ch.setLevel(logging.DEBUG)
        ch.setFormatter(
            _ColorFormatter("[%(asctime)s %(name)s]: %(message)s", datefmt="%m/%d %H:%M:%S")
        )
        logger.addHandler(ch)

    if output is not None:
        filename = output if output.endswith((".txt", ".log")) else os.path.join(output, "log.txt")
        if distributed_rank > 0:
            filename = f"{filename}.rank{distributed_rank}"
        fh = logging.StreamHandler(_cached_stream(filename))
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(fmt)
        logger.addHandler(fh)

    return logger


def log_first_n(lvl, msg, n=1, *, name=None, key="caller"):
    caller_module, caller_key = _find_caller()
    hash_key = (caller_key, msg) if key == "message" else caller_key
    _LOG_COUNTER[hash_key] += 1
    if _LOG_COUNTER[hash_key] <= n:
        logging.getLogger(name or caller_module).log(lvl, msg)


def log_every_n(lvl, msg, n=1, *, name=None):
    caller_module, key = _find_caller()
    _LOG_COUNTER[key] += 1
    if n == 1 or _LOG_COUNTER[key] % n == 1:
        logging.getLogger(name or caller_module).log(lvl, msg)


def log_every_n_seconds(lvl, msg, n=1, *, name=None):
    caller_module, key = _find_caller()
    last_logged = _LOG_TIMER.get(key, None)
    current_time = time.time()
    if last_logged is None or current_time - last_logged >= n:
        logging.getLogger(name or caller_module).log(lvl, msg)
        _LOG_TIMER[key] = current_time


def _find_caller():
    frame = sys._getframe(2)
    while frame:
        code = frame.f_code
        if os.path.join("utils", "logger.") not in code.co_filename:
            mod_name = frame.f_globals.get("__name__", "?")
            return mod_name, (code.co_filename, frame.f_lineno, code.co_name)
        frame = frame.f_back
    return "?", ("?", 0, "?")
