"""Lagrange multiplier estimates.

Mirrors `least_squares_multipliers` / `first_order_multipliers`
(`/root/reference/src/basic_tralcnlss.jl:887-911`).  The p == 0 case (no
nonlinear constraints) returns an empty multiplier vector — the reference
unconditionally factorizes CCᵀ and crashes (SURVEY.md §2.3 quirk 6).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.cholesky import cho_solve_lower

Array = jax.Array


def least_squares_multipliers(x: Array, residuals, jac_res, jac_nlcons) -> Array:
    """Initial estimate y = -(CCᵀ)⁻¹ C (Jᵀ r) via Cholesky of CCᵀ
    (ref `src/basic_tralcnlss.jl:887-903`)."""
    g = jac_res(x).T @ residuals(x)
    C = jac_nlcons(x)
    p = C.shape[0]
    if p == 0:
        return jnp.zeros((0,), dtype=x.dtype)
    L = jnp.linalg.cholesky(C @ C.T)
    return cho_solve_lower(L, -(C @ g))


def first_order_multipliers(y: Array, cx: Array, mu: Array) -> Array:
    """First-order update y ← y + mu·c (ref `src/basic_tralcnlss.jl:905-911`)."""
    return y + mu * cx
