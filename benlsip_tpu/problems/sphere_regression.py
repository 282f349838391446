"""Sphere-regression integration test problem.

Transcription of the reference's end-to-end fixture
(`/root/reference/test/problems/sphere_regression.jl:9-33`): 3 parameters,
4 residuals, 1 nonlinear equality constraint (sphere of radius sqrt(3)),
1 linear equality constraint, full box bounds.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..solver.api import Problem


def residuals(x):
    return jnp.stack(
        [
            x[0] ** 2 + x[1] ** 2 - 2 * x[0] + jnp.sin(x[0] + x[1]) - 1.5,
            x[0] * x[1] + 0.5 * jnp.cos(2 * x[0]) - 0.8,
            (x[0] - 1.0) ** 2 + (x[1] - 0.5) ** 2 - x[2],
            x[2] ** 2 - x[0] + 0.3 * jnp.sin(x[2]) - 0.2,
        ]
    )


def jac_res(x):
    # ref `test/problems/sphere_regression.jl:18-22` (analytic Jacobian).
    z = jnp.zeros((), x.dtype)
    return jnp.stack(
        [
            jnp.stack([2 * x[0] - 2 + jnp.cos(x[0] + x[1]), 2 * x[1] + jnp.cos(x[0] + x[1]), z]),
            jnp.stack([x[1] - jnp.sin(2 * x[0]), x[0], z]),
            jnp.stack([2 * (x[0] - 1), 2 * (x[1] - 0.5), -jnp.ones((), x.dtype)]),
            jnp.stack([-jnp.ones((), x.dtype), z, 2 * x[2] + 0.3 * jnp.cos(x[2])]),
        ]
    )


def nlconstraints(x):
    return jnp.stack([x[0] ** 2 + x[1] ** 2 + x[2] ** 2 - 3.0])


def jac_nlcons(x):
    return jnp.stack([jnp.stack([2 * x[0], 2 * x[1], 2 * x[2]])])


def make_problem(dtype=jnp.float64, analytic_jacobians: bool = True) -> Problem:
    """The fixture with its constraint data (ref :10-14)."""
    return Problem(
        residuals=residuals,
        nlconstraints=nlconstraints,
        jac_res=jac_res if analytic_jacobians else None,
        jac_nlcons=jac_nlcons if analytic_jacobians else None,
        A=jnp.asarray([[1.0, 2.0, -1.0]], dtype),
        b=jnp.asarray([0.5], dtype),
        xl=jnp.asarray([-2.0, -1.5, 0.0], dtype),
        xu=jnp.asarray([2.0, 1.5, 2.0], dtype),
    )


def x0(dtype=jnp.float64):
    """Reference starting point (ref :31)."""
    return jnp.asarray([1.0, 0.5, 1.5], dtype)
