"""Batched-vs-loop equivalence and batched convergence tests (the vmap
parity tier SURVEY.md §4 calls for; no analog exists in the reference)."""
import numpy as np
import jax
import jax.numpy as jnp

from benlsip_tpu.batch.vmap_solve import solve_batched, solve_sequential
from benlsip_tpu.problems.generators import dense_quadratic_family, exp_fit_family, sphere_family
from benlsip_tpu.solver.options import SolverOptions


def test_sphere_family_batched_converges():
    B = 16
    bp, theta, X0 = sphere_family(B)
    X, Y, info = solve_batched(bp, theta, X0, SolverOptions(max_outer_iter=100, max_inner_iter=300))
    assert bool(jnp.all(info.converged)), f"unconverged: {np.asarray(info.converged)}"
    # Per-instance nonlinear feasibility at the reference tolerance.
    assert float(jnp.max(info.feas)) < 1.5e-8
    # Instances genuinely differ (per-instance data took effect).
    assert float(jnp.std(X[:, 0])) > 1e-3


def test_batched_matches_sequential():
    B = 6
    bp, theta, X0 = sphere_family(B, seed=3)
    opts = SolverOptions(max_outer_iter=100, max_inner_iter=300)
    Xb, Yb, ib = solve_batched(bp, theta, X0, opts)
    Xs, Ys, isq = solve_sequential(bp, theta, X0, opts)
    # Batched GEMMs and per-instance GEMVs sum in different orders, so the
    # iteration paths can branch differently; the *fixed points* must agree.
    assert bool(jnp.all(ib.converged)) and bool(jnp.all(isq.converged))
    np.testing.assert_allclose(np.asarray(Xb), np.asarray(Xs), rtol=1e-5, atol=1e-7)


def test_exp_fit_family_with_batched_linear_constraints():
    B = 24
    bp, theta, X0 = exp_fit_family(B, d=16, seed=1)
    opts = SolverOptions(max_outer_iter=40, max_inner_iter=120)
    X, Y, info = solve_batched(bp, theta, X0, opts)
    assert bool(jnp.all(info.converged))
    # The pinned-intercept constraint a + c = y0 holds per instance.
    resid = X[:, 0] + X[:, 2] - theta["y"][:, 0]
    assert float(jnp.max(jnp.abs(resid))) < 1e-7
    # Fit quality: recovered decay rates stay inside their bounds.
    assert float(jnp.min(X[:, 1])) >= 0.05 - 1e-9
    assert float(jnp.max(X[:, 1])) <= 5.0 + 1e-9


def test_dense_family_medium():
    B = 4
    bp, theta, X0 = dense_quadratic_family(B, n=48, d=128, m=3, seed=2)
    opts = SolverOptions(max_outer_iter=20, max_inner_iter=80)
    X, Y, info = solve_batched(bp, theta, X0, opts)
    assert bool(jnp.all(info.converged))
    # Gram-operator mode (H·v through a materialized J'J + mu C'C instead of
    # streaming J twice) must land on the same KKT point.
    Xg, Yg, infog = solve_batched(
        bp, theta, X0, SolverOptions(max_outer_iter=20, max_inner_iter=80, gram_hessian="on")
    )
    assert bool(jnp.all(infog.converged))
    np.testing.assert_allclose(np.asarray(Xg), np.asarray(X), atol=1e-6)
    # Linear feasibility and bounds at the solutions.
    A, b = np.asarray(bp.A), np.asarray(bp.b)
    for i in range(B):
        np.testing.assert_allclose(A @ np.asarray(X[i]), b, atol=1e-7)
        assert np.all(np.asarray(X[i]) >= -0.8 - 1e-9)
        assert np.all(np.asarray(X[i]) <= 0.8 + 1e-9)


def test_chunked_tail_padding_respects_non_pow2_chunk_cap():
    """The ragged tail pads to the next power of two but must never exceed
    the caller's chunk cap (the cap exists as a per-program instance limit):
    chunk=6, B=11 -> tail=5 would round to 8 > 6 without the clamp."""
    from benlsip_tpu.batch.vmap_solve import solve_batched, solve_batched_chunked
    from benlsip_tpu.problems.generators import exp_fit_family

    bp, theta, X0 = exp_fit_family(11, d=16, seed=7)
    opts = SolverOptions(max_outer_iter=25, max_inner_iter=80)
    Xc, Yc, infoc = solve_batched_chunked(bp, theta, X0, opts, chunk=6)
    X, Y, info = solve_batched(bp, theta, X0, opts)
    assert bool(jnp.all(infoc.converged))
    np.testing.assert_allclose(np.asarray(Xc), np.asarray(X), rtol=1e-10, atol=1e-12)
