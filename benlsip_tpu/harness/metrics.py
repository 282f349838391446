"""Structured metrics for batched runs.

The reference logs one scalar row per iteration for one instance
(`src/misc.jl`); at batch scale the useful observables are distributional.
`batch_summary` reduces a batched `SolveInfo` to quantiles + status counts;
`MetricsWriter` appends JSONL rows (the benchmark harness's structured
output, SURVEY.md §5 'metrics/observability' row).
"""
from __future__ import annotations

import json
import time
from typing import IO, Optional

import numpy as np

from ..solver.outer import SolveInfo


def batch_summary(info: SolveInfo) -> dict:
    """Quantiles of criticality/feasibility/iteration counts + status mix."""
    pix = np.asarray(info.pix, dtype=np.float64)
    feas = np.asarray(info.feas, dtype=np.float64)
    inner = np.asarray(info.inner_iters, dtype=np.float64)
    outer = np.asarray(info.outer_iters, dtype=np.float64)
    status = np.asarray(info.status)
    qs = [0.5, 0.9, 0.99, 1.0]

    def q(a):
        a = np.atleast_1d(a)
        return {f"p{int(100*x)}": float(np.quantile(a, x)) for x in qs}

    uniq, counts = np.unique(np.atleast_1d(status), return_counts=True)
    return {
        "batch": int(np.atleast_1d(status).shape[0]),
        "converged_frac": float(np.mean(np.atleast_1d(np.asarray(info.converged)))),
        "status_counts": {int(u): int(c) for u, c in zip(uniq, counts)},
        "pix": q(pix),
        "feas": q(feas),
        "outer_iters": q(outer),
        "inner_iters": q(inner),
    }


class MetricsWriter:
    """Append-only JSONL metrics sink."""

    def __init__(self, path_or_stream):
        if hasattr(path_or_stream, "write"):
            self._stream: IO = path_or_stream
            self._own = False
        else:
            self._stream = open(path_or_stream, "a")
            self._own = True

    def write(self, record: dict, **extra) -> None:
        row = {"ts": time.time(), **record, **extra}
        self._stream.write(json.dumps(row) + "\n")
        self._stream.flush()

    def close(self) -> None:
        if self._own:
            self._stream.close()
