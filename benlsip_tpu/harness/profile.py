"""Profiling hooks (SURVEY.md §5 'tracing/profiling' row — absent in the
reference): jax.profiler trace capture, used by the benchmark harness only
(`bench_roofline.py --trace`).  Phase attribution comes from the
`jax.named_scope` annotations placed inline at the solver's phase
boundaries — cauchy_projected / cauchy_breakpoint_walk /
minor_projected_cg (solver/inner.py), gn_refresh / criticality_projection
(solver/subproblem.py), polish_factor_* / polish_chord_certify
(batch/polish.py) — which label the captured timeline per phase."""
from __future__ import annotations

import contextlib
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a perfetto/tensorboard trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
