"""Hock–Schittkowski problem 48 as a constrained NLS instance.

The reference uses the HS48 point/constraints as its projection fixture
(`/root/reference/test/structures.jl:37-58`); here the full problem is also
solvable: min ‖r(x)‖² with r = (x₁-1, x₂-x₃, x₄-x₅) subject to
Σx = 5 and x₃ - 2(x₄+x₅) = -3.  Optimum at (1,1,1,1,1) with objective 0.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..solver.api import Problem

A = [[1.0, 1.0, 1.0, 1.0, 1.0], [0.0, 0.0, 1.0, -2.0, -2.0]]
b = [5.0, -3.0]


def residuals(x):
    return jnp.stack([x[0] - 1.0, x[1] - x[2], x[3] - x[4]])


def make_problem(dtype=jnp.float64) -> Problem:
    return Problem(
        residuals=residuals,
        A=jnp.asarray(A, dtype),
        b=jnp.asarray(b, dtype),
    )


def x0(dtype=jnp.float64):
    """The classical HS48 start (3, 5, -3, 2, -2) — the reference's fixture
    point (`test/structures.jl:41`)."""
    return jnp.asarray([3.0, 5.0, -3.0, 2.0, -2.0], dtype)


def x_star(dtype=jnp.float64):
    return jnp.ones((5,), dtype)
