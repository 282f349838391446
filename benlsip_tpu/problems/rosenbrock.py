"""Bound-constrained Rosenbrock NLS (BASELINE config 1's example problem).

Residual form r(x) = (10(x₂-x₁²), 1-x₁) with optional box; the classic
n=2/d=2 curved-valley test.  The chained n-dimensional variant gives a
size-scalable single-instance family.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..solver.api import Problem

Array = jax.Array


def residuals2(x: Array) -> Array:
    return jnp.stack([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])


def make_problem(bounded: bool = True, dtype=jnp.float64) -> Problem:
    """2-D Rosenbrock NLS; bounded=True adds the box [-0.5, 1.5]² whose
    lower edge x₁ ≥ -0.5 is inactive at the solution (1, 1) but shapes the
    iteration path."""
    return Problem(
        residuals=residuals2,
        xl=jnp.asarray([-0.5, -0.5], dtype) if bounded else None,
        xu=jnp.asarray([1.5, 1.5], dtype) if bounded else None,
    )


def make_chained(n: int, dtype=jnp.float64) -> Problem:
    """Chained Rosenbrock: d = 2(n-1) residuals, solution at ones(n)."""

    def residuals(x):
        return jnp.concatenate(
            [10.0 * (x[1:] - x[:-1] ** 2), 1.0 - x[:-1]]
        )

    return Problem(
        residuals=residuals,
        xl=jnp.full((n,), -2.0, dtype),
        xu=jnp.full((n,), 2.0, dtype),
    )


def x0(dtype=jnp.float64) -> Array:
    return jnp.asarray([-1.2, 1.0], dtype)
