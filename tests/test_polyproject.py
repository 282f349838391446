"""Oracle tests for the jittable polyhedral projection (the Ipopt
replacement, ref `src/polyhedral_constraints.jl:179-198`): KKT/feasibility
properties plus value-parity against an independent host QP solve (scipy),
mirroring the reference's Ipopt-ground-truth pattern
(`/root/reference/test/structures.jl:37-58`)."""
import numpy as np
import jax
import jax.numpy as jnp
import scipy.optimize

from benlsip_tpu.ops.constraints import Polyhedron
from benlsip_tpu.ops.polyproject import criticality_measure_polyhedron, projection_polyhedron

rng = np.random.default_rng(1)


def scipy_projection(x, A, b, l, u):
    """Independent oracle: minimize ‖v-x‖² over {Av=b, l ≤ v ≤ u}."""
    n = x.shape[0]
    res = scipy.optimize.minimize(
        lambda v: 0.5 * np.sum((v - x) ** 2),
        np.clip(x, np.maximum(l, -1e6), np.minimum(u, 1e6)),
        jac=lambda v: v - x,
        bounds=list(zip(l, u)),
        constraints=[{"type": "eq", "fun": lambda v: A @ v - b, "jac": lambda v: A}]
        if A.shape[0]
        else [],
        method="SLSQP",
        options={"maxiter": 200, "ftol": 1e-14},
    )
    return res.x


def check_projection(poly, x, tol=1e-8):
    v = np.asarray(projection_polyhedron(poly, jnp.asarray(x)))
    A, b, l, u = map(np.asarray, (poly.A, poly.b, poly.xl, poly.xu))
    # Feasibility.
    assert np.all(v >= l - tol) and np.all(v <= u + tol)
    if A.shape[0]:
        np.testing.assert_allclose(A @ v, b, atol=10 * tol)
    # Oracle parity (projection is unique for this strongly convex QP).
    v_oracle = scipy_projection(np.asarray(x), A, b, l, u)
    np.testing.assert_allclose(v, v_oracle, atol=1e-6)
    return v


def test_hs48_projection_with_rhs():
    # The HS48 fixture projected onto the affine set {Av=b} with loose box.
    A = jnp.asarray([[1.0, 1, 1, 1, 1], [0, 0, 1, -2, -2]])
    b = jnp.asarray([5.0, -3])
    n = 5
    poly = Polyhedron(A=A, b=b, xl=jnp.full(n, -10.0), xu=jnp.full(n, 10.0))
    x = np.array([3.0, 5, -3, 2, -2])
    v = check_projection(poly, x)
    # x is already feasible -> projection is x itself.
    np.testing.assert_allclose(v, x, atol=1e-9)


def test_random_qps_match_scipy():
    for trial in range(8):
        m, n = rng.integers(0, 4), 8
        A = rng.standard_normal((m, n))
        v_feas = rng.standard_normal(n)
        l = v_feas - rng.random(n) * 2
        u = v_feas + rng.random(n) * 2
        b = A @ v_feas
        poly = Polyhedron(A=jnp.asarray(A), b=jnp.asarray(b), xl=jnp.asarray(l), xu=jnp.asarray(u))
        x = rng.standard_normal(n) * 3
        check_projection(poly, x)


def test_clip_only_when_no_linear():
    n = 4
    poly = Polyhedron(
        A=jnp.zeros((0, n)), b=jnp.zeros((0,)), xl=jnp.zeros(n), xu=jnp.ones(n)
    )
    x = jnp.asarray([-1.0, 0.5, 2.0, 0.0])
    np.testing.assert_allclose(projection_polyhedron(poly, x), [0.0, 0.5, 1.0, 0.0])


def test_batched_vmap_projection():
    # Batched instances with shared A, per-instance x — the batched active-set
    # projection kernel regime (BASELINE config 3).
    m, n, B = 2, 6, 32
    A = rng.standard_normal((m, n))
    vf = rng.standard_normal(n)
    poly = Polyhedron(
        A=jnp.asarray(A),
        b=jnp.asarray(A @ vf),
        xl=jnp.asarray(vf - 1),
        xu=jnp.asarray(vf + 1),
    )
    X = rng.standard_normal((B, n))
    V = jax.vmap(lambda x: projection_polyhedron(poly, x))(jnp.asarray(X))
    for i in range(0, B, 7):
        v_oracle = scipy_projection(X[i], A, np.asarray(poly.b), np.asarray(poly.xl), np.asarray(poly.xu))
        np.testing.assert_allclose(np.asarray(V[i]), v_oracle, atol=1e-6)


def test_criticality_measure_zero_at_feasible_stationary():
    n = 3
    poly = Polyhedron(
        A=jnp.asarray([[1.0, 2.0, -1.0]]),
        b=jnp.asarray([0.5]),
        xl=jnp.asarray([-2.0, -1.5, 0.0]),
        xu=jnp.asarray([2.0, 1.5, 2.0]),
    )
    x = jnp.asarray([0.5, 0.25, 0.5])  # feasible interior point
    # Gradient orthogonal to feasible set => measure ~ 0 for g in rowspace(A).
    g = jnp.asarray([1.0, 2.0, -1.0]) * 1e-3
    assert float(criticality_measure_polyhedron(poly, x, g)) < 1e-10


# ---------- degenerate-A robustness (SURVEY §7.3-2, VERDICT r2 #6) ----------
# Ipopt, being interior-point, handles rank-deficient / redundant-row A
# natively (ref `src/polyhedral_constraints.jl:185-197`); the dual Newton
# must match that robustness through its scale-relative regularization.


def _dedup_oracle(x, A_dedup, b_dedup, l, u):
    """scipy oracle on the DEDUPLICATED system (SLSQP itself fails on
    redundant equality rows, so the oracle gets the clean formulation —
    the projection is identical because the feasible sets are)."""
    return scipy_projection(x, A_dedup, b_dedup, l, u)


def test_rank_deficient_duplicate_rows_consistent():
    n = 8
    r = np.random.default_rng(7)
    A1 = r.standard_normal((2, n))
    A = np.vstack([A1, 2.0 * A1[0:1]])          # row 3 = 2 x row 1
    xt = r.standard_normal(n)
    b1 = A1 @ xt
    b = np.concatenate([b1, [2.0 * b1[0]]])     # consistent rhs
    l, u = np.full(n, -2.0), np.full(n, 2.0)
    poly = Polyhedron(A=jnp.asarray(A), b=jnp.asarray(b), xl=jnp.asarray(l), xu=jnp.asarray(u))
    z = r.standard_normal(n) * 3
    v, lam = projection_polyhedron(poly, jnp.asarray(z), return_lam=True)
    assert bool(jnp.all(jnp.isfinite(v))) and bool(jnp.all(jnp.isfinite(lam)))
    np.testing.assert_allclose(np.asarray(poly.A) @ np.asarray(v), b, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(v), _dedup_oracle(z, A1, b1, l, u), atol=1e-6
    )


def test_rank_deficient_zero_row_consistent():
    n = 6
    r = np.random.default_rng(8)
    A1 = r.standard_normal((1, n))
    A = np.vstack([A1, np.zeros((1, n))])       # an all-zero row
    xt = r.standard_normal(n)
    b = np.concatenate([A1 @ xt, [0.0]])        # 0·v = 0: trivially consistent
    l, u = np.full(n, -3.0), np.full(n, 3.0)
    poly = Polyhedron(A=jnp.asarray(A), b=jnp.asarray(b), xl=jnp.asarray(l), xu=jnp.asarray(u))
    z = r.standard_normal(n)
    v, lam = projection_polyhedron(poly, jnp.asarray(z), return_lam=True)
    assert bool(jnp.all(jnp.isfinite(v))) and bool(jnp.all(jnp.isfinite(lam)))
    np.testing.assert_allclose(
        np.asarray(v), _dedup_oracle(z, A1, A1 @ xt, l, u), atol=1e-6
    )


def test_inconsistent_rows_finite_no_hang():
    """Inconsistent rhs (row 3 = 2 x row 1 but b3 != 2 b1): the polyhedron
    is empty, so no projection exists — the contract is graceful failure:
    finite output, finite dual, bounded iteration count (the stall exit),
    never NaN or a spin to the cap."""
    n = 8
    r = np.random.default_rng(9)
    A1 = r.standard_normal((2, n))
    A = np.vstack([A1, 2.0 * A1[0:1]])
    xt = r.standard_normal(n)
    b1 = A1 @ xt
    b = np.concatenate([b1, [2.0 * b1[0] + 0.5]])   # contradiction
    l, u = np.full(n, -2.0), np.full(n, 2.0)
    poly = Polyhedron(A=jnp.asarray(A), b=jnp.asarray(b), xl=jnp.asarray(l), xu=jnp.asarray(u))
    z = r.standard_normal(n)
    v, lam = projection_polyhedron(poly, jnp.asarray(z), return_lam=True)
    assert bool(jnp.all(jnp.isfinite(v))) and bool(jnp.all(jnp.isfinite(lam)))
    # The returned point still respects the box (it is v*(lam) by construction).
    assert np.all(np.asarray(v) >= l - 1e-12) and np.all(np.asarray(v) <= u + 1e-12)


def test_nearly_dependent_rows_consistent():
    """Rows dependent to 1e-12: the generalized Jacobian is numerically
    singular on interior active sets; the reg path must still converge to
    the true projection."""
    n = 10
    r = np.random.default_rng(10)
    A1 = r.standard_normal((2, n))
    A = np.vstack([A1, A1[0] + 1e-12 * r.standard_normal(n)])
    xt = r.standard_normal(n)
    b = np.concatenate([A1 @ xt, [float(A[2] @ xt)]])
    l, u = np.full(n, -2.5), np.full(n, 2.5)
    poly = Polyhedron(A=jnp.asarray(A), b=jnp.asarray(b), xl=jnp.asarray(l), xu=jnp.asarray(u))
    z = r.standard_normal(n) * 2
    v = projection_polyhedron(poly, jnp.asarray(z))
    assert bool(jnp.all(jnp.isfinite(v)))
    np.testing.assert_allclose(np.asarray(poly.A) @ np.asarray(v), b, atol=1e-8)
    np.testing.assert_allclose(np.asarray(v), _dedup_oracle(z, A1, A1 @ xt, l, u), atol=1e-6)


def _moving_projection_problem(seed=3, n=64, m=6, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    A = jnp.asarray(rng.standard_normal((m, n)) / np.sqrt(n), dtype)
    x_feas = jnp.asarray(rng.standard_normal(n), dtype)
    b = A @ x_feas
    poly = Polyhedron(A=A, b=b, xl=jnp.full((n,), -2.0, dtype), xu=jnp.full((n,), 2.0, dtype))
    return poly, rng


def test_warm_start_beats_cold_on_moving_sequence():
    """A slowly-moving projection point (the per-TR-iteration criticality
    pattern) warm-started with the previous dual must take no more Newton
    iterations than cold starts over the sequence (VERDICT r3 #7)."""
    poly, rng = _moving_projection_problem()
    x = jnp.asarray(rng.standard_normal(64))
    step = 0.01 * jnp.asarray(rng.standard_normal(64))
    lam = None
    warm_iters = cold_iters = 0
    for k in range(8):
        xk = x + k * step
        v_w, lam, it_w = projection_polyhedron(poly, xk, lam0=lam, return_lam=True, return_iters=True)
        v_c, it_c = projection_polyhedron(poly, xk, return_iters=True)
        warm_iters += int(it_w)
        cold_iters += int(it_c)
        np.testing.assert_allclose(np.asarray(v_w), np.asarray(v_c), rtol=1e-9, atol=1e-10)
    assert warm_iters <= cold_iters, (warm_iters, cold_iters)


def test_stale_warm_start_rescued_by_cold_restart():
    """A deliberately bad warm dual must not park the damped Newton at an
    above-tolerance stall exit: the in-loop cold restart recovers the same
    projection as the cold start (round-3 root cause of the forced cold
    starts in criticality_measure)."""
    poly, rng = _moving_projection_problem(seed=7)
    x = jnp.asarray(rng.standard_normal(64))
    bad = jnp.asarray(1e6 * rng.standard_normal(poly.A.shape[0]))
    v_bad, it_bad = projection_polyhedron(poly, x, lam0=bad, return_iters=True)
    v_cold = projection_polyhedron(poly, x)
    np.testing.assert_allclose(np.asarray(v_bad), np.asarray(v_cold), rtol=1e-9, atol=1e-9)
    # Residual actually at tolerance, not a stall exit.
    F = np.asarray(poly.A) @ np.asarray(v_bad) - np.asarray(poly.b)
    assert np.linalg.norm(F) <= 1e-10 * (1 + np.linalg.norm(np.asarray(poly.b)))
