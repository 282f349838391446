"""Classic HS/MGH battery: every entry solves, is feasible, and hits the
published optimum (or an exact host-side KKT oracle where the optimum has
no closed form).

Extends the reference's single-fixture integration tier
(`/root/reference/test/problems/sphere_regression.jl:36-66`) to the
standard constrained-NLS batteries; the unconstrained MGH entries also pin
quirk-6 coverage (the reference crashes without constraints, we must not).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from benlsip_tpu import SolverOptions, is_feasible, solve
from benlsip_tpu.problems.classic import REGISTRY

OPTS = SolverOptions(max_outer_iter=100, max_inner_iter=300)
FEAS_TOL = float(np.sqrt(np.finfo(np.float64).eps))


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_classic_problem(name):
    rec = REGISTRY[name]
    problem = rec.make_problem()
    x0 = rec.x0()
    opts = (
        SolverOptions(max_outer_iter=100, **rec.options) if rec.options else OPTS
    )
    x, y, info = solve(problem, x0, opts)
    x_np = np.asarray(x)

    assert bool(info.converged), f"{name}: not converged (pix={info.pix})"
    assert np.all(np.isfinite(x_np))

    fns, poly = problem.build(x0.shape[0], jnp.float64)
    assert bool(is_feasible(poly, x)), f"{name}: polyhedron infeasible"
    cx = np.asarray(fns.nlconstraints(x))
    if cx.size:
        assert np.linalg.norm(cx) < FEAS_TOL, f"{name}: ||c||={np.linalg.norm(cx)}"

    if rec.f_star is not None:
        f = 0.5 * float(jnp.sum(fns.residuals(x) ** 2))
        # Quartic residual terms reach f only to ~crit_tol^(4/3) grade.
        assert f - rec.f_star < 1e-8 + 1e-6 * abs(rec.f_star), (
            f"{name}: f={f} vs f*={rec.f_star}"
        )
    if rec.x_star is not None:
        err = np.max(np.abs(x_np - np.asarray(rec.x_star)))
        assert err < rec.x_tol, f"{name}: ||x-x*||_inf={err} (tol {rec.x_tol})"


@pytest.mark.parametrize("name", ["hs52", "hs53"])
def test_linear_ls_entries_match_exact_kkt(name):
    """HS52/HS53 optima are awkward fractions; certify against the exact
    saddle-point solve of the equality-constrained linear LS instead of a
    transcribed constant (the objective is r = Gx - h with constant G)."""
    rec = REGISTRY[name]
    problem = rec.make_problem()
    n = rec.x0().shape[0]

    G = np.asarray(jax.jacfwd(problem.residuals)(jnp.zeros(n)))
    h = -np.asarray(problem.residuals(jnp.zeros(n)))
    A = np.asarray(problem.A)
    b = np.asarray(problem.b)
    m = A.shape[0]
    K = np.block([[G.T @ G, A.T], [A, np.zeros((m, m))]])
    rhs = np.concatenate([G.T @ h, b])
    x_exact = np.linalg.solve(K, rhs)[:n]

    x, _, info = solve(problem, rec.x0(), OPTS)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(x), x_exact, atol=1e-8)
    if name == "hs53":
        # The +-10 box must be inactive at the optimum.
        assert np.max(np.abs(x_exact)) < 10.0


def test_registry_shapes_are_consistent():
    for name, rec in REGISTRY.items():
        x0 = rec.x0()
        if rec.x_star is not None:
            assert len(rec.x_star) == x0.shape[0], name
        r = rec.make_problem().residuals(x0)
        assert r.ndim == 1 and r.shape[0] >= 1, name
