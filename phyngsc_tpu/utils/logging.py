"""Structured logging + profiling hooks.

The reference's observability is printf with [I]/[E]/[!] prefixes and a
per-rank exit table (SURVEY §5, phyNGSC.cpp:108,63,323,1066). Here the same
prefixes feed Python logging (machine-parseable, level-filtered), and
`trace()` wraps a scope in a `jax.profiler` trace for device timelines —
the tracing capability the reference lacks entirely.
"""

from __future__ import annotations

import contextlib
import logging
import os
import sys
import time

_logger = logging.getLogger("phyngsc_tpu")
if not _logger.handlers:
    h = logging.StreamHandler(sys.stderr)
    h.setFormatter(logging.Formatter("%(message)s"))
    _logger.addHandler(h)
    _logger.setLevel(os.environ.get("PHYNGSC_LOG", "INFO").upper())


def debug(msg: str, *args) -> None:
    _logger.debug("[D] " + msg, *args)


def info(msg: str, *args) -> None:
    _logger.info("[I] " + msg, *args)


def warn(msg: str, *args) -> None:
    _logger.warning("[!] " + msg, *args)


def error(msg: str, *args) -> None:
    _logger.error("[E] " + msg, *args)


@contextlib.contextmanager
def trace(trace_dir: str | None):
    """Profile a scope with jax.profiler when trace_dir is set (view with
    TensorBoard / xprof); no-op otherwise."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
    info("profiler trace written to %s", trace_dir)


@contextlib.contextmanager
def timed(label: str, sink: dict | None = None):
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if sink is not None:
        sink[label] = sink.get(label, 0.0) + dt
