"""Behavioral-parity tests for the reference quirks catalogued in
SURVEY.md §2.3 — each asserts this build implements the documented *intent*
(and that the intent-level behavior is what users observe)."""
import numpy as np
import jax
import jax.numpy as jnp

from benlsip_tpu.ops.al import AlHessian
from benlsip_tpu.ops.constraints import Polyhedron, make_active_set
from benlsip_tpu.solver.cg import projected_cg
from benlsip_tpu.solver.status import CG_MAX_ITER, CG_SOLVED
from benlsip_tpu.solver.subproblem import update_tr


def test_quirk1_minor_budget_clamped_nonnegative():
    # Quirk 1: ref :425's single-arg max() no-op; intended max(n-m-#fix, 0).
    # Observable: inner_step with everything fixed must terminate cleanly.
    from benlsip_tpu.solver.inner import inner_step

    n = 3
    poly = Polyhedron(
        A=jnp.ones((2, n)) * jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]]),
        b=jnp.zeros(2),
        xl=jnp.zeros(n),
        xu=jnp.zeros(n),  # degenerate box: every variable fixed
    )
    H = AlHessian(jnp.eye(n), jnp.zeros((0, n)), jnp.asarray(1.0))
    from benlsip_tpu.solver.options import SolverOptions

    s, pred, aset, _stats = inner_step(
        jnp.zeros(n), jnp.ones(n), H, poly, jnp.asarray(1.0), SolverOptions(), 1e-8
    )
    assert np.all(np.asarray(s) == 0.0)


def test_quirk4_cg_status_never_undefined():
    # Quirk 4: ref :753-761 can return `nothing`; here every exit path maps
    # to a code — zero-dimensional tangent space reports CG_MAX_ITER/SOLVED.
    n, m = 2, 2
    A = jnp.eye(2)
    poly = Polyhedron(A=A, b=jnp.zeros(m), xl=jnp.full(n, -1.0), xu=jnp.full(n, 1.0))
    aset = make_active_set(poly, jnp.zeros(n, bool))
    H = AlHessian(jnp.eye(n), jnp.zeros((0, n)), jnp.asarray(1.0))
    w, status, _ = projected_cg(
        jnp.ones(n), H, jnp.full(n, -1.0), jnp.full(n, 1.0), poly, aset, 0.1
    )
    assert int(status) in (int(CG_MAX_ITER), int(CG_SOLVED))
    assert np.all(np.asarray(w) == 0.0)


def test_quirk7_tr_ratio_sign_convention():
    # Quirk 7: ared/pred both negative-good; rho positive-good.  NaN rho
    # (0/0) keeps the radius, matching Julia's NaN-comparison chain.
    d = jnp.asarray(1.0)
    assert float(update_tr(d, jnp.asarray(0.9), 0.25, 0.75, 0.0625, 2.0)) == 2.0
    assert float(update_tr(d, jnp.asarray(0.1), 0.25, 0.75, 0.0625, 2.0)) == 0.0625
    assert float(update_tr(d, jnp.asarray(0.5), 0.25, 0.75, 0.0625, 2.0)) == 1.0
    assert float(update_tr(d, jnp.asarray(jnp.nan), 0.25, 0.75, 0.0625, 2.0)) == 1.0


def test_quirk6_empty_constraint_blocks_supported():
    # Quirk 6: the reference crashes without ≥1 linear AND ≥1 nonlinear
    # constraint; all four combinations must solve here.
    from benlsip_tpu import Problem, solve

    t = jnp.asarray([0.3, -0.2])
    combos = []
    for with_lin in (False, True):
        for with_nl in (False, True):
            p = Problem(
                residuals=lambda x: x - t,
                nlconstraints=(lambda x: jnp.stack([x[0] - x[1] - 0.5])) if with_nl else None,
                A=jnp.ones((1, 2)) if with_lin else None,
                b=jnp.asarray([0.1]) if with_lin else None,
                xl=jnp.full(2, -1.0),
                xu=jnp.full(2, 1.0),
            )
            x, y, info = solve(p, jnp.zeros(2))
            combos.append(bool(info.converged))
    assert all(combos), combos


def test_quirk5_no_side_effect_logging_by_default(tmp_path, capsys):
    # Quirk 5: the reference always writes ../test/benlsip.out; here default
    # runs produce no log output at all.
    from benlsip_tpu import SolverOptions, solve
    from benlsip_tpu.problems import sphere_regression as sr

    solve(sr.make_problem(), sr.x0(), SolverOptions(max_outer_iter=50, max_inner_iter=150))
    jax.effects_barrier()
    out = capsys.readouterr()
    assert "Outer iter" not in out.out and "Outer iter" not in out.err


def test_quirk2_cauchy_interior_minimum_stops_before_breakpoint():
    # Quirk 2: ref :624's `delta_t < theta` statement discards its value
    # (dead leftover; delta_t recomputed at :623 identically to :618).  The
    # *intent* — stop at the segment-interior 1D minimizer when
    # delta_t = -phi'/phi'' < theta — is live behavior here:
    from benlsip_tpu.solver.inner import cauchy_step

    n = 2
    poly = Polyhedron(
        A=jnp.zeros((0, n)), b=jnp.zeros(0),
        xl=jnp.full(n, -10.0), xu=jnp.full(n, 10.0),
    )
    H = AlHessian(jnp.eye(n), jnp.zeros((0, n)), jnp.asarray(1.0))  # H = I
    g = jnp.asarray([1.0, 0.5])
    # Interior minimum: delta_t = ||g||^2/||g||^2 = 1 < theta = 10/1 = 10,
    # so s = -g exactly, with NO bound activated.
    s, aset = cauchy_step(jnp.zeros(n), g, H, poly, jnp.asarray(5.0), 1e-10)
    np.testing.assert_allclose(np.asarray(s), -np.asarray(g), atol=1e-12)
    assert not bool(jnp.any(aset.fixed))

    # Breakpoint before the minimizer: coord 0's lower bound at -0.3 cuts
    # the first segment (theta = 0.3 < delta_t); the walk must clamp coord
    # 0, re-project, and continue to the constrained minimizer (-0.3, -0.5).
    poly2 = Polyhedron(
        A=jnp.zeros((0, n)), b=jnp.zeros(0),
        xl=jnp.asarray([-0.3, -10.0]), xu=jnp.full(n, 10.0),
    )
    s2, aset2 = cauchy_step(jnp.zeros(n), g, H, poly2, jnp.asarray(5.0), 1e-10)
    np.testing.assert_allclose(np.asarray(s2), [-0.3, -0.5], atol=1e-10)
    assert bool(aset2.fixed[0]) and not bool(aset2.fixed[1])


def test_quirk3_minor_loop_box_binds_free_variables():
    # Quirk 3: ref :664-665 tightens the CG box only on FIXED vars (whose
    # components are zero anyway), leaving free vars at ±inf — so
    # factor_to_boundary/linesearch see alpha_allowed = inf and the minor
    # step can leave the trust region or the feasible box.  Intended (and
    # implemented) semantics: the remaining TR/bound gap binds the FREE
    # variables.
    from benlsip_tpu.ops.constraints import make_active_set
    from benlsip_tpu.solver.inner import minor_iterate

    n = 2
    poly = Polyhedron(
        A=jnp.zeros((0, n)), b=jnp.zeros(0),
        xl=jnp.full(n, -10.0), xu=jnp.asarray([0.1, 10.0]),
    )
    aset = make_active_set(poly, jnp.zeros(n, bool))
    H = AlHessian(jnp.eye(n), jnp.zeros((0, n)), jnp.asarray(1.0))
    x = jnp.zeros(n)
    s = jnp.zeros(n)
    g_minor = jnp.asarray([-5.0, 0.0])  # unconstrained CG solution w = (5, 0)
    w, status, _ = minor_iterate(x, s, g_minor, H, poly, aset, jnp.asarray(5.0), 0.1)
    # The free variable's step must respect the remaining gap to xu[0]=0.1.
    assert float(w[0]) <= 0.1 + 1e-9, float(w[0])
    xn = np.asarray(x + s + w)
    assert np.all(xn <= np.asarray(poly.xu) + 1e-9)


def test_quirk8_rejected_subproblem_bookkeeping():
    # Quirk 8: ref :284-293 — on a rejected subproblem (feas > eta) the
    # iterate and multipliers are UNCHANGED, the subproblem cost is paid,
    # mu escalates by tau, and the tolerances reset against the NEW mu.
    import dataclasses as dc

    from benlsip_tpu.solver.api import NLSFunctions
    from benlsip_tpu.solver.options import SolverOptions
    from benlsip_tpu.solver.outer import default_atol, outer_body, outer_init

    # min (x-2)^2/2 s.t. x = 0: at mu = 10 the AL minimizer has
    # |c(x)| ~ 0.09 >> eta, forcing the reject branch.
    fns = NLSFunctions(
        residuals=lambda x: x - 2.0,
        nlconstraints=lambda x: x,
        jac_res=lambda x: jnp.eye(1, dtype=x.dtype),
        jac_nlcons=lambda x: jnp.eye(1, dtype=x.dtype),
    )
    poly = Polyhedron(
        A=jnp.zeros((0, 1)), b=jnp.zeros(0),
        xl=jnp.full(1, -10.0), xu=jnp.full(1, 10.0),
    )
    opts = SolverOptions(eta0=1e-12, feas_tol=1e-12, crit_tol=1e-10)
    c0 = outer_init(fns, poly, jnp.ones(1), opts)
    c1 = outer_body(fns, poly, opts, default_atol(jnp.float64), c0)
    assert not bool(c1.critical)
    # Iterate and multipliers unchanged (paid subproblem discarded).
    np.testing.assert_array_equal(np.asarray(c1.x), np.asarray(c0.x))
    np.testing.assert_array_equal(np.asarray(c1.y), np.asarray(c0.y))
    # Penalty escalated; tolerances reset against the new mu.
    assert float(c1.mu) == float(c0.mu) * opts.tau
    np.testing.assert_allclose(float(c1.omega), opts.omega0 / float(c1.mu) ** opts.k_crit)
    np.testing.assert_allclose(float(c1.eta), opts.eta0 / float(c1.mu) ** opts.k_feas)
    # The subproblem cost was paid (ref prints pix from the rejected solve).
    assert int(c1.inner_total) > 0 and np.isfinite(float(c1.pix))


def test_quirk9_step_active_bounds_uses_tr_clamped_lower():
    # Quirk 9: dead `src/utils.jl:218` used max(t, delta); the live
    # `active_bounds` (ref `src/polyhedral_constraints.jl:227`) correctly
    # clamps the step box with max(xl - x, -delta).  Pin the live intent:
    # a step reaching the TR face (-delta) is flagged active even when the
    # actual bound is far away; a mid-box step is not.
    from benlsip_tpu.ops.constraints import step_active_bounds

    n = 2
    poly = Polyhedron(
        A=jnp.zeros((0, n)), b=jnp.zeros(0),
        xl=jnp.full(n, -10.0), xu=jnp.full(n, 10.0),
    )
    x = jnp.zeros(n)
    mask = step_active_bounds(poly, x, jnp.asarray([-1.0, 0.2]), jnp.asarray(1.0), 1e-10)
    assert bool(mask[0]) and not bool(mask[1])
    # Bound closer than the radius: the box edge is the bound itself.
    poly2 = Polyhedron(
        A=jnp.zeros((0, n)), b=jnp.zeros(0),
        xl=jnp.asarray([-0.5, -10.0]), xu=jnp.full(n, 10.0),
    )
    mask2 = step_active_bounds(poly2, x, jnp.asarray([-0.5, 0.2]), jnp.asarray(1.0), 1e-10)
    assert bool(mask2[0]) and not bool(mask2[1])
