"""Unit tests for the ops layer, mirroring the reference's test strategy
(`/root/reference/test/structures.jl`): matrix-free operators vs dense
ground truth, masked factorization vs greedy/augmented recompute, projection
vs fixture oracle, active-set bookkeeping.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from benlsip_tpu.ops.al import AlHessian, hv, vhv
from benlsip_tpu.ops.cholesky import (
    cho_solve_lower,
    cholesky_aug_aat_dense,
    factor_masked_aat,
    masked_aat,
)
from benlsip_tpu.ops.constraints import (
    ActiveSet,
    Polyhedron,
    active_bounds_at,
    add_active,
    make_active_set,
    nb_fix,
    no_active_set,
    step_active_bounds,
)
from benlsip_tpu.ops.project import left_mul, left_mul_tr, project_tangent

rng = np.random.default_rng(0)


def test_al_hessian_matvec_and_quadform():
    # ref test/structures.jl:1-16 — identity vs dense J'J + mu C'C.
    n = 5
    J = jnp.asarray(rng.random((n, n)))
    C = jnp.asarray(rng.random((n, n)))
    mu = jnp.asarray(rng.random())
    v = jnp.asarray(rng.random(n))
    H = AlHessian(J, C, mu)
    H_dense = J.T @ J + mu * C.T @ C
    np.testing.assert_allclose(hv(H, v), H_dense @ v, rtol=1e-12)
    np.testing.assert_allclose(vhv(H, v), v @ H_dense @ v, rtol=1e-12)


def test_al_hessian_gram_mode_matches_matrix_free():
    # with_gram materializes G = J'J + mu C'C once; hv/vhv through G must
    # agree with the factored form (and with p == 0 constraint blocks).
    from benlsip_tpu.ops.al import with_gram

    for p in (3, 0):
        n, d = 7, 19
        J = jnp.asarray(rng.random((d, n)))
        C = jnp.asarray(rng.random((p, n)))
        mu = jnp.asarray(2.5)
        v = jnp.asarray(rng.random(n))
        H = AlHessian(J, C, mu)
        Hg = with_gram(H)
        assert Hg.G is not None and Hg.G.shape == (n, n)
        np.testing.assert_allclose(hv(Hg, v), hv(H, v), rtol=1e-12)
        np.testing.assert_allclose(vhv(Hg, v), vhv(H, v), rtol=1e-12)


def test_al_hessian_empty_constraints():
    # p == 0 nonlinear constraints must work (reference crashes, quirk 6).
    n, d = 4, 6
    J = jnp.asarray(rng.random((d, n)))
    C = jnp.zeros((0, n))
    H = AlHessian(J, C, jnp.asarray(3.0))
    v = jnp.asarray(rng.random(n))
    np.testing.assert_allclose(hv(H, v), J.T @ (J @ v), rtol=1e-12)


def test_masked_factor_matches_greedy_and_augmented():
    # ref test/structures.jl:18-35 — incremental factorization vs greedy
    # chol(BB') with B = [A; I[act,:]]; here additionally the masked m×m
    # factor is checked against the Schur complement of the dense augmented
    # factorization (see ops/cholesky.py docstring).
    m, n = 3, 6
    A = rng.random((m, n))
    act = np.array([1, 3, 5])
    fixed = np.zeros(n, dtype=bool)
    fixed[act] = True

    # Dense augmented oracle vs greedy recompute (the reference's own test).
    L_aat = np.linalg.cholesky(A @ A.T)
    L_aug = cholesky_aug_aat_dense(A, fixed, L_aat)
    B = np.vstack([A, np.eye(n)[act, :]])
    L_greedy = np.linalg.cholesky(B @ B.T)
    np.testing.assert_allclose(L_aug, L_greedy, rtol=1e-10, atol=1e-12)

    # Masked factor: chol(A Z A') must equal chol of the Schur complement
    # AA' - A E' E A' of the identity block of the augmented matrix.
    free = jnp.asarray(~fixed)
    K = masked_aat(jnp.asarray(A), free)
    E = np.eye(n)[act, :]
    schur = A @ A.T - (A @ E.T) @ (E @ A.T)
    np.testing.assert_allclose(np.asarray(K), schur, rtol=1e-12)
    L = factor_masked_aat(jnp.asarray(A), free)
    np.testing.assert_allclose(np.asarray(L @ L.T), schur, rtol=1e-10, atol=1e-12)


def test_projection_hs48_fixture():
    # ref test/structures.jl:37-58 — HS48 point, Ipopt-precomputed answer.
    A = jnp.asarray([[1.0, 1, 1, 1, 1], [0, 0, 1, -2, -2]])
    m, n = A.shape
    x_hs = jnp.asarray([3.0, 5, -3, 2, -2])
    proj_xhs = np.array([0.0, 0, 0, 2, -2])  # obtained with Ipopt (ref :43)
    fixed = jnp.asarray([True, True, False, False, False])

    poly = Polyhedron(A=A, b=jnp.asarray([5.0, -3]), xl=jnp.full(n, -jnp.inf), xu=jnp.full(n, jnp.inf))
    aset = make_active_set(poly, fixed)

    # left_mul / left_mul_tr parity vs dense B = [A; E] (ref :50-52), with
    # the masked fixed-shape (m+n,) layout: bound slots sit at m + i.
    B = np.vstack([np.asarray(A), np.eye(n)[np.asarray(fixed)]])
    y = rng.random(m + 2)
    y_full = np.zeros(m + n)
    y_full[:m] = y[:m]
    y_full[m + np.flatnonzero(np.asarray(fixed))] = y[m:]
    np.testing.assert_allclose(
        left_mul_tr(poly, fixed, jnp.asarray(y_full)), B.T @ y, rtol=1e-12
    )
    lm = np.asarray(left_mul(poly, fixed, x_hs))
    np.testing.assert_allclose(lm[:m], np.asarray(A) @ np.asarray(x_hs), rtol=1e-12)
    np.testing.assert_allclose(
        lm[m + np.flatnonzero(np.asarray(fixed))], np.asarray(x_hs)[np.asarray(fixed)], rtol=1e-12
    )

    v = project_tangent(poly, aset, x_hs)
    assert np.all(np.abs(np.asarray(v)[np.asarray(fixed)]) <= 1e-15)
    assert float(jnp.vdot(A @ v, A @ v)) <= 1e-15
    np.testing.assert_allclose(np.asarray(v), proj_xhs, rtol=1e-10, atol=1e-10)


def test_projection_matches_dense_normal_equations():
    # Masked projection == explicit dense Ã normal-equations projection for
    # random masks (equivalence proof backing ops/cholesky.py).
    for trial in range(5):
        m, n = 3, 9
        A = rng.random((m, n))
        fixed = rng.random(n) < 0.3
        r = rng.random(n)
        poly = Polyhedron(
            A=jnp.asarray(A),
            b=jnp.zeros(m),
            xl=jnp.full(n, -jnp.inf),
            xu=jnp.full(n, jnp.inf),
        )
        aset = make_active_set(poly, jnp.asarray(fixed))
        v = np.asarray(project_tangent(poly, aset, jnp.asarray(r)))

        Bt = np.vstack([A, np.eye(n)[fixed]])
        v_dense = r - Bt.T @ np.linalg.solve(Bt @ Bt.T, Bt @ r)
        np.testing.assert_allclose(v, v_dense, rtol=1e-9, atol=1e-11)
        # Idempotence + tangency.
        v2 = np.asarray(project_tangent(poly, aset, jnp.asarray(v)))
        np.testing.assert_allclose(v2, v, rtol=1e-9, atol=1e-11)


def test_projection_no_linear_constraints():
    # m == 0 block (reference crashes — quirk 6): projection is just masking.
    n = 4
    poly = Polyhedron(
        A=jnp.zeros((0, n)), b=jnp.zeros((0,)), xl=jnp.full(n, -jnp.inf), xu=jnp.full(n, jnp.inf)
    )
    fixed = jnp.asarray([True, False, False, True])
    aset = make_active_set(poly, fixed)
    r = jnp.asarray([1.0, 2, 3, 4])
    np.testing.assert_allclose(project_tangent(poly, aset, r), [0.0, 2, 3, 0])


def test_active_bounds_bookkeeping():
    # ref test/structures.jl:60-78 — identification, add_active, union.
    m, n = 3, 7
    A = jnp.asarray(rng.random((m, n)))
    poly = Polyhedron(A=A, b=jnp.zeros(m), xl=jnp.full(n, -10.0), xu=jnp.full(n, 10.0))
    x = jnp.asarray(rng.random(n)).at[1].set(-10.0)

    atol = float(np.sqrt(np.finfo(np.float64).eps))
    fixed = active_bounds_at(poly, x, atol)
    assert bool(fixed[1]) and int(jnp.sum(fixed)) == 1

    aset = make_active_set(poly, fixed)
    mask = jnp.zeros(n, bool).at[jnp.asarray([2, 4])].set(True)
    aset = add_active(poly, aset, mask)
    assert bool(aset.fixed[2]) and bool(aset.fixed[4])
    aset = add_active(poly, aset, 6)
    expect = np.zeros(n, bool)
    expect[[1, 2, 4, 6]] = True
    np.testing.assert_array_equal(np.asarray(aset.fixed), expect)
    assert int(nb_fix(aset)) == 4
    # Factorization stays consistent with the mask after each update.
    K = masked_aat(A, ~aset.fixed)
    np.testing.assert_allclose(np.asarray(aset.chol @ aset.chol.T), np.asarray(K), rtol=1e-10)


def test_step_active_bounds():
    n = 4
    poly = Polyhedron(
        A=jnp.zeros((0, n)),
        b=jnp.zeros((0,)),
        xl=jnp.asarray([-1.0, -1, -1, -1]),
        xu=jnp.asarray([1.0, 1, 1, 1]),
    )
    x = jnp.zeros(n)
    delta = jnp.asarray(0.5)
    s = jnp.asarray([0.5, 0.2, -0.5, 0.0])  # hits TR bound on 0 and 2
    mask = step_active_bounds(poly, x, s, delta, 1e-8)
    np.testing.assert_array_equal(np.asarray(mask), [True, False, True, False])


def test_cho_solve_lower():
    m = 5
    M = rng.random((m, m))
    K = M @ M.T + m * np.eye(m)
    L = jnp.asarray(np.linalg.cholesky(K))
    b = jnp.asarray(rng.random(m))
    np.testing.assert_allclose(cho_solve_lower(L, b), np.linalg.solve(K, b), rtol=1e-10)
