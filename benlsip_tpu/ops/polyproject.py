"""Exact projection onto the polyhedron {v : Av = b, l ≤ v ≤ u}.

In-framework, jittable, batchable replacement for the reference's external
Ipopt QP solve (`projection_polyhedron`,
`/root/reference/src/polyhedral_constraints.jl:179-198`) — the single place
where the reference leaves Julia for a foreign solver (SURVEY.md §3.4).
Here no host callback is needed: the QP

    min_v 1/2 ‖v - x‖²  s.t.  A v = b,  l ≤ v ≤ u

is solved in its dual.  Eliminating v against the box gives the piecewise
affine-smooth concave dual in λ ∈ ℝᵐ (m is small):

    v*(λ) = clip(x - Aᵀλ, l, u),     F(λ) = A v*(λ) - b = 0 at the optimum.

F is solved by a damped semismooth Newton iteration: the generalized
Jacobian is -A D Aᵀ with D = diag(1{l < x - Aᵀλ < u}), so each step is one
m×m Cholesky solve + two GEMVs — the same kernel shapes as the active-set
projections, fully jittable (`lax.while_loop`, fixed caps) and vmappable
over batches of instances.  This finite active-set Newton typically
terminates in a handful of steps at machine precision, giving the
√eps-grade accuracy the reference gets from Ipopt.

Used by: the legacy Cauchy variant's path (ref `src/basic_tralcnlss.jl:478`),
the ‖P(x-g)-x‖ criticality measure (ref :850-860), and as the KKT oracle in
tests (ref `test/problems/sphere_regression.jl:58`) — mirroring the
reference, the live inner loop does *not* call it.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .cholesky import cho_solve_lower
from .constraints import Polyhedron

Array = jax.Array


class _NewtonCarry(NamedTuple):
    lam: Array
    Fnorm: Array
    it: Array


def projection_polyhedron(
    poly: Polyhedron,
    x: Array,
    tol: float | None = None,
    max_iter: int = 100,
    reg: float | None = None,
) -> Array:
    """Project x onto {v : Av = b, l ≤ v ≤ u}. Jittable; vmap for batches.

    Replaces `projection_polyhedron` (ref
    `src/polyhedral_constraints.jl:179-198`).  `tol` defaults to
    sqrt(eps(dtype))·eps-grade stationarity on the dual residual ‖Av*-b‖;
    `reg` is the Tikhonov jitter on A D Aᵀ guarding degenerate active sets.
    """
    dtype = x.dtype
    eps = jnp.finfo(dtype).eps
    if tol is None:
        tol = float(eps) ** 0.75  # tighter than sqrt(eps); Newton hits it fast
    if reg is None:
        reg = float(eps) ** 0.5

    A, b, l, u = poly.A, poly.b, poly.xl, poly.xu
    m = A.shape[0]
    if m == 0:
        return jnp.clip(x, l, u)

    eye = jnp.eye(m, dtype=dtype)
    tol_val = jnp.asarray(tol, dtype) * (1 + jnp.linalg.norm(b))

    def v_of(lam):
        return jnp.clip(x - A.T @ lam, l, u)

    def F_of(lam):
        return A @ v_of(lam) - b

    def q_of(lam):
        # Concave dual objective; F = ∇q, so damping on q (not on ‖F‖, which
        # is non-monotone along ascent directions) is globally convergent.
        v = v_of(lam)
        return 0.5 * jnp.vdot(v - x, v - x) + jnp.vdot(lam, A @ v - b)

    def cond(c: _NewtonCarry):
        return (c.Fnorm > tol_val) & (c.it < max_iter)

    def body(c: _NewtonCarry):
        lam = c.lam
        z = x - A.T @ lam
        inactive = (z > l) & (z < u)
        AD = A * inactive.astype(dtype)[None, :]
        K = AD @ A.T + jnp.asarray(reg, dtype) * eye
        F = F_of(lam)
        L = jnp.linalg.cholesky(K)
        dlam = cho_solve_lower(L, F)

        # Exact linesearch: along lam + t·dlam the dual q is concave
        # piecewise-quadratic, so its slope
        #     phi(t) = dᵀ∇q = wᵀ clip(z0 - t·w, l, u) - dᵀb,   w = Aᵀ·dlam
        # is non-increasing; bracket its root by doubling, then bisect.
        # Each phi eval is O(n) vector work (no matvec).  K SPD ⇒ dlam is an
        # ascent direction (phi(0) = FᵀK⁻¹F > 0), so progress is guaranteed
        # even when K is nearly singular and the Newton length is meaningless.
        z0 = x - A.T @ lam
        w = A.T @ dlam
        db = jnp.vdot(dlam, b)

        def phi(t):
            return jnp.vdot(w, jnp.clip(z0 - t * w, l, u)) - db

        def grow(state):
            t_hi, _ = state
            return (t_hi * 2.0, phi(t_hi * 2.0))

        def grow_cond(state):
            t_hi, p = state
            return (p > 0) & (t_hi < 1e18)

        t_hi, _ = lax.while_loop(grow_cond, grow, (jnp.asarray(1.0, dtype), phi(jnp.asarray(1.0, dtype))))

        def bisect(_, tlohi):
            t_lo, t_hi = tlohi
            t_mid = 0.5 * (t_lo + t_hi)
            pos = phi(t_mid) > 0
            return (jnp.where(pos, t_mid, t_lo), jnp.where(pos, t_hi, t_mid))

        t_lo, t_hi = lax.fori_loop(0, 64, bisect, (jnp.asarray(0.0, dtype), t_hi))
        t_star = 0.5 * (t_lo + t_hi)
        # Monotone safeguard (roundoff): never accept a dual decrease.
        lam_new = jnp.where(q_of(lam + t_star * dlam) >= q_of(lam), lam + t_star * dlam, lam)
        return _NewtonCarry(lam_new, jnp.linalg.norm(F_of(lam_new)), c.it + 1)

    lam0 = jnp.zeros((m,), dtype)
    c0 = _NewtonCarry(lam0, jnp.linalg.norm(F_of(lam0)), jnp.asarray(0, jnp.int32))
    out = lax.while_loop(cond, body, c0)
    return v_of(out.lam)


def criticality_measure_polyhedron(poly: Polyhedron, x: Array, g: Array) -> Array:
    """‖P(x - g) - x‖ with P the exact polyhedral projection.

    The reference's alternative 6-arg `criticality_measure`
    (ref `src/basic_tralcnlss.jl:850-860`), also the KKT measure used by its
    integration test (ref `test/problems/sphere_regression.jl:58-62`).
    """
    return jnp.linalg.norm(projection_polyhedron(poly, x - g) - x)
