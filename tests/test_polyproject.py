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
