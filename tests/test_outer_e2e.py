"""End-to-end integration tests.

The sphere-regression problem with the reference's three assertions
(`/root/reference/test/problems/sphere_regression.jl:36-66`):
‖c(x*)‖ < sqrt(eps), polyhedral feasibility, and projected-gradient KKT
measure ‖x* - P(x* - ∇L)‖ < 1e-7 using the exact polyhedral projection as
oracle — plus cases the reference cannot express (bound-only, autodiff
Jacobians)."""
import numpy as np
import jax
import jax.numpy as jnp

from benlsip_tpu import Problem, SolverOptions, is_feasible, solve, tralcnllss
from benlsip_tpu.ops.polyproject import projection_polyhedron
from benlsip_tpu.problems import sphere_regression as sr


def kkt_measure(problem_poly, x, grad_lag):
    p = projection_polyhedron(problem_poly, x - grad_lag)
    return float(jnp.linalg.norm(x - p))


def test_sphere_regression_e2e():
    # ref test/problems/sphere_regression.jl:38-48
    problem = sr.make_problem()
    x0 = sr.x0()
    opts = SolverOptions(max_outer_iter=100, max_inner_iter=250)
    x, y, info = solve(problem, x0, opts)

    feas_tol = float(np.sqrt(np.finfo(np.float64).eps))
    cx = sr.nlconstraints(x)
    assert float(jnp.linalg.norm(cx)) < feas_tol          # ref :63
    fns, poly = problem.build(3, jnp.float64)
    assert bool(is_feasible(poly, x))                     # ref :64

    # KKT via the exact-projection oracle (ref :56-62, Ipopt there).
    grad_lag = sr.jac_res(x).T @ sr.residuals(x) + sr.jac_nlcons(x).T @ y
    assert kkt_measure(poly, x, grad_lag) < 1e-7          # ref :65
    assert bool(info.converged)


def test_sphere_regression_reference_entry_point():
    # The positional reference-parity surface (ref src/basic_tralcnlss.jl:167).
    x, y, info = tralcnllss(
        sr.x0(),
        sr.residuals,
        sr.jac_res,
        sr.nlconstraints,
        sr.jac_nlcons,
        jnp.asarray([[1.0, 2.0, -1.0]]),
        jnp.asarray([0.5]),
        jnp.asarray([-2.0, -1.5, 0.0]),
        jnp.asarray([2.0, 1.5, 2.0]),
        max_outer_iter=100,
        max_inner_iter=250,
    )
    assert float(jnp.linalg.norm(sr.nlconstraints(x))) < 1.5e-8
    assert bool(info.converged)


def test_sphere_regression_autodiff_jacobians():
    # Autodiff path (no analytic Jacobians) must reach the same point.
    problem = sr.make_problem(analytic_jacobians=False)
    x, y, info = solve(problem, sr.x0(), SolverOptions(max_outer_iter=100, max_inner_iter=250))
    x_ref, _, _ = solve(problem := sr.make_problem(), sr.x0(), SolverOptions(max_outer_iter=100, max_inner_iter=250))
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=1e-6, atol=1e-8)


def test_bound_only_problem():
    # min ||x - t||^2 with box [0,1]^n, no linear/nonlinear constraints —
    # crashes the reference (quirk 6), must work here.
    t = jnp.asarray([1.5, -0.5, 0.3])
    problem = Problem(
        residuals=lambda x: x - t,
        xl=jnp.zeros(3),
        xu=jnp.ones(3),
    )
    x, y, info = solve(problem, jnp.asarray([0.5, 0.5, 0.5]))
    np.testing.assert_allclose(np.asarray(x), [1.0, 0.0, 0.3], atol=1e-7)
    assert y.shape == (0,)


def test_unconstrained_gauss_newton():
    # Pure NLS (Rosenbrock residual form): r = (10(x2-x1^2), 1-x1).
    def r(x):
        return jnp.stack([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])

    problem = Problem(residuals=r)
    x, y, info = solve(problem, jnp.asarray([-1.2, 1.0]))
    np.testing.assert_allclose(np.asarray(x), [1.0, 1.0], atol=1e-6)


def test_linear_equality_only():
    # min ||x||^2 s.t. sum(x) = 1 -> x = 1/n.
    n = 4
    problem = Problem(
        residuals=lambda x: x,
        A=jnp.ones((1, n)),
        b=jnp.ones((1,)),
    )
    x, y, info = solve(problem, jnp.asarray([1.0, 0.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(x), np.full(n, 0.25), atol=1e-7)


def test_warm_start_multipliers():
    """solve(..., y0=...) warm-starts the constraint multipliers: same
    solution, no more outer iterations than the cold least-squares start
    (the continuation/sweep reuse pattern; the reference always recomputes
    its LS estimate, ref :887-902)."""
    import numpy as np

    from benlsip_tpu import SolverOptions, solve
    from benlsip_tpu.problems import sphere_regression as sr

    opts = SolverOptions(max_outer_iter=100, max_inner_iter=250)
    x_c, y_c, info_c = solve(sr.make_problem(), sr.x0(), opts)
    assert bool(info_c.converged)
    x_w, y_w, info_w = solve(sr.make_problem(), sr.x0(), opts, y0=y_c)
    assert bool(info_w.converged)
    np.testing.assert_allclose(np.asarray(x_w), np.asarray(x_c), rtol=1e-7, atol=1e-9)
    assert int(info_w.outer_iters) <= int(info_c.outer_iters)
