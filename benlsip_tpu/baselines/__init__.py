"""Single-core CPU baselines (no JAX dispatch) for honest benchmarking.

The reference publishes no numbers and Julia is not installable in this
environment (BASELINE.md), so the measured stand-in for "single-core
reference execution" is a tight pure-numpy implementation of the same
solve — hand-written the way a performance-aware reference user would,
with zero per-op framework overhead.
"""
from .numpy_ref import solve_exp_fit_numpy, solve_one_numpy  # noqa: F401
