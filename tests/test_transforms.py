"""Inequality-constraint slack transform (solver/transforms.py).

The reference has no inequality support at all
(`/root/reference/src/basic_tralcnlss.jl:167-197` — equalities + bounds
only); `with_inequalities` reduces g(x) ≥ 0 / Gx ≥ h to the supported
form.  Fixtures have known analytic solutions so the lifted solve is
checked against ground truth, active and inactive cases both.
"""
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from benlsip_tpu import Problem, SolverOptions, solve, with_inequalities


OPTS = SolverOptions(max_outer_iter=60, max_inner_iter=200)


def test_linear_inequality_active():
    """min ‖x − p‖² s.t. x₁ + x₂ ≥ 1, with p inside the cut half-plane:
    solution is the Euclidean projection onto the line x₁ + x₂ = 1."""
    p = jnp.asarray([0.2, 0.1])
    prob = Problem(residuals=lambda x: x - p)
    lift = with_inequalities(prob, p, G=jnp.asarray([[1.0, 1.0]]), h=jnp.asarray([1.0]))
    z, y, info = solve(lift.problem, lift.z0, OPTS)
    assert bool(info.converged)
    x = np.asarray(lift.unlift(z))
    # Projection of p onto {x1+x2=1}: p + (1 − p·1)/2 · 1
    expect = np.asarray(p) + (1 - float(p.sum())) / 2.0
    np.testing.assert_allclose(x, expect, rtol=1e-7, atol=1e-8)
    _, t = lift.slacks(z)
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-7)  # active


def test_linear_inequality_inactive():
    """Same geometry with p already feasible: constraint inactive, x* = p,
    slack strictly positive."""
    p = jnp.asarray([0.9, 0.8])
    prob = Problem(residuals=lambda x: x - p)
    lift = with_inequalities(prob, p, G=jnp.asarray([[1.0, 1.0]]), h=jnp.asarray([1.0]))
    z, y, info = solve(lift.problem, lift.z0, OPTS)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(lift.unlift(z)), np.asarray(p), atol=1e-8)
    _, t = lift.slacks(z)
    assert float(t[0]) > 0.5  # 1.7 − 1 = 0.7 slack


def test_nonlinear_inequality_disk():
    """min ‖x − p‖² s.t. ‖x‖² ≤ 1 (as g(x) = 1 − ‖x‖² ≥ 0), p outside the
    disk: solution is p/‖p‖, inequality active."""
    p = jnp.asarray([1.8, 0.6])
    prob = Problem(residuals=lambda x: x - p)
    lift = with_inequalities(prob, jnp.asarray([0.5, 0.2]),
                             nl_ineq=lambda x: jnp.asarray([1.0 - x @ x]))
    z, y, info = solve(lift.problem, lift.z0, OPTS)
    assert bool(info.converged)
    x = np.asarray(lift.unlift(z))
    expect = np.asarray(p) / np.linalg.norm(np.asarray(p))
    np.testing.assert_allclose(x, expect, rtol=1e-6, atol=1e-7)
    s, _ = lift.slacks(z)
    np.testing.assert_allclose(np.asarray(s), 0.0, atol=1e-6)


def test_mixed_equality_inequality_and_bounds():
    """All blocks at once: equality Ax=b, nonlinear inequality, bounds.
    min ‖x − p‖² s.t. x₁ + x₂ + x₃ = 1.5, x₃ ≥ x₁² (lifted), 0 ≤ x ≤ 1.
    Checked against a scipy ground truth."""
    scipy_opt = pytest.importorskip("scipy.optimize")
    p = np.asarray([0.9, 0.9, 0.1])
    A = jnp.asarray([[1.0, 1.0, 1.0]])
    b = jnp.asarray([1.5])
    prob = Problem(
        residuals=lambda x: x - jnp.asarray(p),
        A=A, b=b, xl=jnp.zeros(3), xu=jnp.ones(3),
    )
    lift = with_inequalities(
        prob, jnp.asarray([0.4, 0.4, 0.7]),
        nl_ineq=lambda x: jnp.asarray([x[2] - x[0] ** 2]),
    )
    z, y, info = solve(lift.problem, lift.z0, OPTS)
    assert bool(info.converged)
    x = np.asarray(lift.unlift(z))

    res = scipy_opt.minimize(
        lambda v: 0.5 * np.sum((v - p) ** 2), np.asarray([0.4, 0.4, 0.7]),
        constraints=[
            {"type": "eq", "fun": lambda v: v.sum() - 1.5},
            {"type": "ineq", "fun": lambda v: v[2] - v[0] ** 2},
        ],
        bounds=[(0.0, 1.0)] * 3, method="SLSQP",
        options={"ftol": 1e-12, "maxiter": 500},
    )
    assert res.success
    np.testing.assert_allclose(x, res.x, rtol=1e-5, atol=1e-6)


def test_batched_lifted_family():
    """The lifted problem vmaps like any other: a small batched family
    with per-instance targets, every instance converging."""
    from benlsip_tpu.batch.vmap_solve import BatchedProblem, solve_batched

    B = 8
    rng = np.random.default_rng(0)
    P_ = jnp.asarray(rng.uniform(0.5, 2.0, (B, 2)))
    lift = with_inequalities(
        Problem(residuals=lambda x: x - P_[0]), P_[0],
        nl_ineq=lambda x: jnp.asarray([1.0 - x @ x]),
    )

    bp = BatchedProblem(
        residuals=lambda z, th: z[:2] - th["p"],
        nlconstraints=lambda z, th: jnp.asarray([1.0 - z[:2] @ z[:2] - z[2]]),
        A=lift.problem.A, b=lift.problem.b,
        xl=lift.problem.xl, xu=lift.problem.xu,
    )
    Z0 = jnp.concatenate(
        [P_ / jnp.linalg.norm(P_, axis=1, keepdims=True) * 0.5,
         jnp.full((B, 1), 0.5)], axis=1)
    Z, Y, info = solve_batched(bp, {"p": P_}, Z0, OPTS)
    assert bool(jnp.all(info.converged))
    X = np.asarray(Z[:, :2])
    Pn = np.asarray(P_)
    nrm = np.linalg.norm(Pn, axis=1, keepdims=True)
    # ‖p‖ > 1 → projection onto the unit circle; ‖p‖ ≤ 1 → x* = p
    # (inactive disk constraint; e.g. seed-0 instance 1 has ‖p‖ = 0.77).
    expect = np.where(nrm > 1.0, Pn / nrm, Pn)
    np.testing.assert_allclose(X, expect, rtol=1e-6, atol=1e-6)


def test_hs21_linear_inequality():
    """HS21 (Hock–Schittkowski): min 0.01x₁² + x₂² − 100 s.t.
    10x₁ − x₂ ≥ 10, 2 ≤ x₁ ≤ 50, −50 ≤ x₂ ≤ 50.  Published optimum
    x* = (2, 0), f* = −99.96 — a bound-active solution with the linear
    inequality INACTIVE (10·2 − 0 = 20 > 10), exercising the slack's
    interior case on a published problem."""
    prob = Problem(
        residuals=lambda x: jnp.asarray([jnp.sqrt(0.02) * x[0], jnp.sqrt(2.0) * x[1]]),
        xl=jnp.asarray([2.0, -50.0]), xu=jnp.asarray([50.0, 50.0]),
    )
    lift = with_inequalities(prob, jnp.asarray([-1.0, -1.0]),
                             G=jnp.asarray([[10.0, -1.0]]), h=jnp.asarray([10.0]))
    z, y, info = solve(lift.problem, lift.z0, OPTS)
    assert bool(info.converged)
    x = np.asarray(lift.unlift(z))
    np.testing.assert_allclose(x, [2.0, 0.0], atol=1e-7)
    f = 0.01 * x[0] ** 2 + x[1] ** 2 - 100
    np.testing.assert_allclose(f, -99.96, atol=1e-9)


def test_hs15_nonlinear_inequalities():
    """HS15: min 100(x₂ − x₁²)² + (1 − x₁)² s.t. x₁x₂ ≥ 1, x₁ + x₂² ≥ 0,
    x₁ ≤ 0.5, from the book's start (−2, 1).  Published optimum
    x* = (0.5, 2), f* = 306.5 — both the bound and the first nonlinear
    inequality active (0.5 · 2 = 1), a nonconvex problem where the AL
    machinery must track the active inequality through the slack."""
    prob = Problem(
        residuals=lambda x: jnp.asarray([10 * (x[1] - x[0] ** 2), 1 - x[0]]),
        xu=jnp.asarray([0.5, jnp.inf]),
    )
    lift = with_inequalities(
        prob, jnp.asarray([-2.0, 1.0]),
        nl_ineq=lambda x: jnp.asarray([x[0] * x[1] - 1.0, x[0] + x[1] ** 2]),
    )
    z, y, info = solve(lift.problem, lift.z0, OPTS)
    assert bool(info.converged)
    x = np.asarray(lift.unlift(z))
    np.testing.assert_allclose(x, [0.5, 2.0], atol=1e-6)
    f = 100 * (x[1] - x[0] ** 2) ** 2 + (1 - x[0]) ** 2
    np.testing.assert_allclose(f, 306.5, atol=1e-7)


def test_transform_argument_guards():
    """Mis-keyed calls raise instead of silently dropping constraints
    (review findings): h without G, jac_ineq without nl_ineq."""
    prob = Problem(residuals=lambda x: x)
    with pytest.raises(ValueError, match="h given without G"):
        with_inequalities(prob, jnp.zeros(2), nl_ineq=lambda x: x, h=jnp.asarray([1.0]))
    with pytest.raises(ValueError, match="jac_ineq given without nl_ineq"):
        with_inequalities(prob, jnp.zeros(2), G=jnp.eye(2), h=jnp.zeros(2),
                          jac_ineq=lambda x: jnp.eye(2))


def test_scalar_single_constraint_promoted():
    """A scalar-returning nl_ineq (one constraint, no array wrapper) works:
    promoted to a length-1 vector, with a hand-coded (n,) Jacobian row."""
    p = jnp.asarray([1.8, 0.6])
    prob = Problem(residuals=lambda x: x - p)
    lift = with_inequalities(
        prob, jnp.asarray([0.5, 0.2]),
        nl_ineq=lambda x: 1.0 - x @ x,          # scalar
        jac_ineq=lambda x: -2.0 * x,            # (n,) row
    )
    z, y, info = solve(lift.problem, lift.z0, OPTS)
    assert bool(info.converged)
    expect = np.asarray(p) / np.linalg.norm(np.asarray(p))
    np.testing.assert_allclose(np.asarray(lift.unlift(z)), expect, rtol=1e-6, atol=1e-7)
