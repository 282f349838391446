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
    s, pred, aset = inner_step(
        jnp.zeros(n), jnp.ones(n), H, poly, jnp.asarray(1.0), 50, 0.1, 0.1, 1e-8
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
    w, status = projected_cg(
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
