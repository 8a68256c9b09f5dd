"""Logging, timing and lightweight observability.

Behavioral equivalent of the reference's console layer
(include/common/common.hpp:92-205: message/submessage/error, verbose-only
log/status pairs, Timer) rebuilt on Python logging, plus JAX memory stats in
place of malloc_count's mem_peak (include/common/common.hpp:118-120).
"""

from __future__ import annotations

import contextlib
import logging
import sys
import time

_FMT = "[%(levelname)s] %(name)s: %(message)s"


def get_logger(name: str = "colbwt", verbose: bool | None = None) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(_FMT))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
    if verbose is not None:
        logger.setLevel(logging.DEBUG if verbose else logging.INFO)
    return logger


class Timer:
    """Wall-clock stage timer (reference Timer, include/common/common.hpp:129-174)."""

    def __init__(self) -> None:
        self._start = 0.0
        self._mid = 0.0
        self._end = 0.0

    def start(self) -> "Timer":
        self._start = time.perf_counter()
        return self

    def mid(self) -> None:
        self._mid = time.perf_counter()

    def end(self) -> None:
        self._end = time.perf_counter()

    @property
    def start_duration(self) -> float:
        return self._end - self._start

    @property
    def mid_duration(self) -> float:
        return self._end - self._mid


@contextlib.contextmanager
def status(msg: str, logger: logging.Logger | None = None):
    """Phase timing context: logs "<msg>... DONE (Xs)" at DEBUG level.

    Equivalent of the status()/status() bracket pair at
    include/common/common.hpp:193-205.
    """
    logger = logger or get_logger()
    logger.debug("%s...", msg)
    t0 = time.perf_counter()
    yield
    logger.debug("%s DONE (%.3fs)", msg, time.perf_counter() - t0)


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache: cold CLI/bench runs reuse compiled
    query kernels across processes (first compiles through the tunneled TPU
    backend cost minutes; cached reloads are seconds)."""
    import os

    import jax

    cache_dir = path or os.path.expanduser("~/.cache/colbwt_tpu/jax")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the knobs — harmless
        pass


def device_mem_peak() -> dict:
    """Per-device memory stats, the TPU stand-in for malloc_count peak RSS."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats() or {}
        except Exception:
            stats = {}
        out[str(d)] = {
            k: stats[k]
            for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
            if k in stats
        }
    return out
