"""Independent first-principles KKT oracle (VERDICT r3 item 6).

The framework's own certificate (exact-projection criticality,
ops/polyproject.py) and its C++ host twin share one algorithm; this oracle
checks the KKT conditions from their definitions with numpy lstsq only —
the rebuild's analog of the reference certifying against third-party Ipopt
(`/root/reference/test/problems/sphere_regression.jl:58-62`).
"""
import numpy as np
import jax
import jax.numpy as jnp

from benlsip_tpu import SolverOptions, solve
from benlsip_tpu.baselines.kkt_oracle import kkt_check_point, kkt_cross_check_batch
from benlsip_tpu.problems import sphere_regression as sr


def test_oracle_agrees_on_sphere_solution():
    """A converged sphere-regression solve passes the independent check;
    a perturbed point fails it."""
    opts = SolverOptions(max_outer_iter=100, max_inner_iter=250)
    x, y, info = solve(sr.make_problem(), sr.x0(), opts)
    assert bool(info.converged)
    fns, poly = sr.make_problem().build(3, jnp.float64)
    args = dict(
        r=np.asarray(fns.residuals(x)), J=np.asarray(fns.jac_res(x)),
        c=np.asarray(fns.nlconstraints(x)), C=np.asarray(fns.jac_nlcons(x)),
        A=np.asarray(poly.A), b=np.asarray(poly.b),
        xl=np.asarray(poly.xl), xu=np.asarray(poly.xu),
    )
    res = kkt_check_point(np.asarray(x), **args)
    assert res["ok"], res

    x_bad = np.asarray(x) + 1e-4
    xb = jnp.asarray(x_bad)
    res_bad = kkt_check_point(
        x_bad, r=np.asarray(fns.residuals(xb)), J=np.asarray(fns.jac_res(xb)),
        c=np.asarray(fns.nlconstraints(xb)), C=np.asarray(fns.jac_nlcons(xb)),
        A=args["A"], b=args["b"], xl=args["xl"], xu=args["xu"],
    )
    assert not res_bad["ok"], res_bad


def test_oracle_agrees_on_batched_family():
    """Sampled cross-check over a batched mixed-precision solve: every
    certified instance passes the independent oracle."""
    from benlsip_tpu.batch.refine import solve_mixed_precision
    from benlsip_tpu.problems.generators import exp_fit_family

    B = 32
    bp, theta, X0 = exp_fit_family(B, d=32, seed=11, dtype=jnp.float64)
    opts = SolverOptions(max_outer_iter=40, max_inner_iter=120)
    X, Y, info = solve_mixed_precision(bp, theta, X0, opts, chunk=B)
    assert int(jnp.sum(info.converged)) == B
    out = kkt_cross_check_batch(bp, theta, X, sample=8)
    assert out["oracle_checked"] == 8
    assert out["oracle_agree"] == 8, out


def test_oracle_bound_active_sign_condition():
    """A bound-constrained minimizer ON the bound passes; the same point
    with the objective pushing OFF the bound (wrong dual sign) fails."""
    # min 1/2 (x-2)^2 with x <= 1: minimizer x* = 1 on the bound, gradient
    # g = x - 2 = -1 <= 0 there (sigma_hi = -g = 1 >= 0) — a KKT point.
    x = np.array([1.0])
    J = np.array([[1.0]])
    res = kkt_check_point(
        x, r=np.array([x[0] - 2.0]), J=J, c=None, C=None, A=None, b=None,
        xl=np.array([-np.inf]), xu=np.array([1.0]),
    )
    assert res["ok"], res
    # min 1/2 (x+2)^2 with x <= 1 at x = 1: the true minimizer x = -2 is
    # interior, g = 3 > 0 implies the feasible direction -1 descends, so
    # the implied sigma_hi = -3 < 0 must fail the sign condition.
    res_bad = kkt_check_point(
        x, r=np.array([x[0] + 2.0]), J=J, c=None, C=None, A=None, b=None,
        xl=np.array([-np.inf]), xu=np.array([1.0]),
    )
    assert not res_bad["ok"], res_bad


def test_oracle_fully_active_box_with_equalities():
    """A genuine KKT point whose EVERY coordinate sits on a bound, with an
    equality present, must pass: the multiplier estimate then has no free
    stationarity rows, so the oracle solves the sign-constrained full-row
    system instead of falsely testing raw-gradient signs (round-4 advisor
    finding).

    Problem: min 1/2 ||x - t||^2  s.t.  x1 + x2 = 2,  0 <= x <= 1, with
    t = (2, 2).  Unique feasible point of {x1+x2=2} ∩ [0,1]² is x=(1,1) —
    both coordinates upper-active.  Stationarity: g = x - t = (-1,-1) =
    -A^T mu + sigma_hi with mu = 1, sigma_hi = 0 >= 0: a KKT point.
    """
    x = np.array([1.0, 1.0])
    res = kkt_check_point(
        x, r=x - np.array([2.0, 2.0]), J=np.eye(2), c=None, C=None,
        A=np.array([[1.0, 1.0]]), b=np.array([2.0]),
        xl=np.zeros(2), xu=np.ones(2),
    )
    assert res["ok"], res
    assert res.get("degenerate_all_active"), res

    # Negative case: fully-active point that is NOT KKT.  n=3 with the
    # same equality on (x1, x2); x = (1, 1, 0) has x3 lower-active and the
    # target t3 = 5 pulls x3 INWARD: sigma_lo_3 = gL_3 = x3 - 5 = -5 < 0
    # and no mu (which touches only coords 1, 2) can fix it — the
    # sign-constrained full-row system keeps a residual of 5.
    x3 = np.array([1.0, 1.0, 0.0])
    res_bad = kkt_check_point(
        x3, r=x3 - np.array([2.0, 2.0, 5.0]), J=np.eye(3), c=None, C=None,
        A=np.array([[1.0, 1.0, 0.0]]), b=np.array([2.0]),
        xl=np.zeros(3), xu=np.ones(3),
    )
    assert not res_bad["ok"], res_bad
