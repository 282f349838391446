"""Profiling hooks (SURVEY.md §5 'tracing/profiling' row — absent in the
reference): jax.profiler traces with per-phase named scopes, used by the
benchmark harness only — never inside the jitted hot path."""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a perfetto/tensorboard trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def named_scope(name: str):
    """Annotate a region of traced code; shows up in profiler timelines."""
    return jax.named_scope(name)


@contextlib.contextmanager
def wall_timer() -> Iterator[dict]:
    """Wall-clock timer with an explicit device fence at exit.

    Fences belong in the harness, not in jitted code; use
    `jax.block_until_ready` on the outputs you time.
    """
    box = {"seconds": None}
    t0 = time.perf_counter()
    try:
        yield box
    finally:
        box["seconds"] = time.perf_counter() - t0
