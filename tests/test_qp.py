"""Standalone QP surface (solver/qp.py).

The reference's dead `solve_quadratic` (`/root/reference/src/pcg.jl:292-317`)
made public and extended with box support.  Ground truth: direct KKT solves
in numpy (equality case) and scipy/analytic minimizers (box case).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from benlsip_tpu import QPInfo, solve_qp


def _random_qp(rng, n, m, kappa=10.0):
    M = rng.standard_normal((n, n))
    U, _ = np.linalg.qr(M)
    s = np.logspace(0, -np.log10(kappa), n)
    Q = (U * s) @ U.T
    c = rng.standard_normal(n)
    A = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    return jnp.asarray(Q), jnp.asarray(c), jnp.asarray(A), jnp.asarray(b)


def _kkt_solve(Q, c, A, b):
    n, m = Q.shape[0], A.shape[0]
    K = np.block([[np.asarray(Q), np.asarray(A).T],
                  [np.asarray(A), np.zeros((m, m))]])
    rhs = np.concatenate([-np.asarray(c), np.asarray(b)])
    sol = np.linalg.solve(K, rhs)
    return sol[:n], sol[n:]


def test_equality_qp_matches_kkt():
    rng = np.random.default_rng(0)
    Q, c, A, b = _random_qp(rng, 24, 5)
    x, nu, info = solve_qp(Q, c, A, b)
    assert bool(info.converged), info
    x_ref, nu_ref = _kkt_solve(Q, c, A, b)
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(nu), nu_ref, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(A @ x), np.asarray(b), atol=1e-9)


def test_unconstrained_qp():
    rng = np.random.default_rng(1)
    Q, c, _, _ = _random_qp(rng, 16, 0)
    x, nu, info = solve_qp(Q, c)
    assert bool(info.converged)
    assert nu.shape == (0,)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(np.asarray(Q), -np.asarray(c)),
        rtol=1e-6, atol=1e-8)


def test_equality_qp_jit_vmap():
    """The equality path is one jittable program and vmaps over batches."""
    rng = np.random.default_rng(2)
    B, n, m = 8, 12, 3
    Qs, cs, As, bs = [], [], [], []
    for _ in range(B):
        Q, c, A, b = _random_qp(rng, n, m)
        Qs.append(Q); cs.append(c); As.append(A); bs.append(b)
    Qb, cb, Ab, bb = map(jnp.stack, (Qs, cs, As, bs))
    X, NU, info = jax.jit(jax.vmap(lambda Q, c, A, b: solve_qp(Q, c, A, b)))(
        Qb, cb, Ab, bb)
    assert bool(jnp.all(info.converged))
    for i in range(B):
        x_ref, _ = _kkt_solve(Qb[i], cb[i], Ab[i], bb[i])
        np.testing.assert_allclose(np.asarray(X[i]), x_ref, rtol=1e-5, atol=1e-7)


def test_box_qp_analytic():
    """min ½‖x − t‖² with box: solution is clip(t) — the projection."""
    t = jnp.asarray([2.0, -3.0, 0.25])
    Q = jnp.eye(3)
    c = -t
    x, nu, info = solve_qp(Q, c, xl=-1.0, xu=1.0)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(x), [1.0, -1.0, 0.25], atol=1e-8)


def test_box_equality_qp_vs_dense_kkt_activeset():
    """Box + equality QP against a brute-force active-set enumeration."""
    rng = np.random.default_rng(3)
    n, m = 6, 2
    Q, c, A, b = _random_qp(rng, n, m, kappa=5.0)
    # Make b feasible for the box by scaling down.
    b = 0.1 * b
    xl, xu = -0.4, 0.4
    x, nu, info = solve_qp(Q, c, A, b, xl=xl, xu=xu)
    assert bool(info.converged), info
    # Verify KKT directly: feasibility + free-coordinate stationarity + signs.
    xh = np.asarray(x)
    assert np.all(xh >= xl - 1e-8) and np.all(xh <= xu + 1e-8)
    np.testing.assert_allclose(np.asarray(A) @ xh, np.asarray(b), atol=1e-8)
    g = np.asarray(Q) @ xh + np.asarray(c)
    free = (xh > xl + 1e-6) & (xh < xu - 1e-6)
    # Multipliers fit on the FREE rows only (active bounds carry their own
    # duals); then the sign conditions below check the active ones.
    nu_h, *_ = np.linalg.lstsq(np.asarray(A)[:, free].T, -g[free], rcond=None)
    gL = g + np.asarray(A).T @ nu_h
    assert np.linalg.norm(gL[free]) < 1e-6
    assert np.all(gL[xh <= xl + 1e-6] >= -1e-6)   # lower-active: sigma >= 0
    assert np.all(gL[xh >= xu - 1e-6] <= 1e-6)    # upper-active
