"""CholeskyQR2 — the GEMM-shaped orthogonal factorization (VERDICT r2 #2).

Pins

* `ops/qr.cholqr2_r` against the Householder `qr_r` ground truth (R is
  unique up to row signs for full-rank S; both here produce positive
  diagonals, so direct comparison is valid),
* the shift-rescue path at κ(S) beyond Cholesky breakdown,
* the operator builder `with_r_factor_cholqr2` vs the dense Hessian,
* end-to-end solver parity gn_factorization="cholqr2" vs "qr"/"normal",
* the sharded mode: cholqr2 under shard_map (the route that lifts the
  round-2 Householder ban) — parity with the pjit path and an HLO
  collective-mix pin (psum-only: J is never gathered),
* the row-sharded R layout (gram_layout="sharded" + cholqr2).

Reference anchor: the LAPACK factorization surface this replaces,
`/root/reference/src/basic_tralcnlss.jl:206, 897-901`.
"""
import dataclasses
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from benlsip_tpu.ops.al import AlHessian, hv, vhv, with_r_factor_cholqr2
from benlsip_tpu.ops.qr import cholqr2_r, cholqr2i_r, qr_r
from benlsip_tpu.solver.options import SolverOptions


def _conditioned(rng, d, n, kappa, dtype=np.float64):
    U, _ = np.linalg.qr(rng.standard_normal((d, n)))
    V, _ = np.linalg.qr(rng.standard_normal((n, n)))
    s = np.logspace(0, -np.log10(kappa), n)
    return jnp.asarray((U * s) @ V.T, dtype)


def test_cholqr2_matches_householder_r():
    rng = np.random.default_rng(0)
    S = _conditioned(rng, 256, 32, 1e3)
    R_c = np.asarray(cholqr2_r(S))
    R_h = np.asarray(qr_r(S))
    # Fix Householder's row signs to the positive-diagonal convention.
    R_h = R_h * np.sign(np.diag(R_h))[:, None]
    assert np.all(np.diag(R_c) > 0)
    np.testing.assert_allclose(R_c, R_h, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.tril(R_c, -1), 0.0, atol=1e-14)


@pytest.mark.parametrize("dtype,kappa,rtol", [
    (np.float64, 1e8, 1e-13),   # beyond f32 breakdown, fine in f64 unshifted
    (np.float32, 1e5, 1e-5),    # κ² eps(f32) > 1: exercises the shift rescue
])
def test_cholqr2_product_identity_ill_conditioned(dtype, kappa, rtol):
    """RᵀR = SᵀS holds at any κ — the rescue shift perturbs only the
    conditioning of the CholeskyQR2 transforms, never the product."""
    rng = np.random.default_rng(1)
    S = _conditioned(rng, 192, 24, kappa, dtype)
    R = np.asarray(cholqr2_r(S), np.float64)
    G = np.asarray(S, np.float64).T @ np.asarray(S, np.float64)
    assert np.all(np.isfinite(R))
    err = np.linalg.norm(R.T @ R - G) / np.linalg.norm(G)
    assert err < rtol, err


def test_cholqr2i_matches_explicit_and_householder():
    """The implicit refinement (G₂ = R₁⁻ᵀGR₁⁻¹ from the already-formed
    Gram, ops/qr.cholqr2i_r) reproduces the explicit pass in the working
    regime — same R as Householder to O(eps·κ)."""
    rng = np.random.default_rng(10)
    S = _conditioned(rng, 256, 32, 1e3)
    R_i = np.asarray(cholqr2i_r(S))
    R_h = np.asarray(qr_r(S))
    R_h = R_h * np.sign(np.diag(R_h))[:, None]
    assert np.all(np.diag(R_i) > 0)
    np.testing.assert_allclose(R_i, R_h, rtol=1e-8, atol=1e-11)
    G = np.asarray(S, np.float64).T @ np.asarray(S, np.float64)
    err = np.linalg.norm(R_i.astype(np.float64).T @ R_i.astype(np.float64) - G)
    assert err / np.linalg.norm(G) < 1e-13


@pytest.mark.parametrize("dtype,kappa,rtol", [
    (np.float32, 1e4, 1e-5),    # the ORDINARY f32 breakdown point (ADVICE r3)
    (np.float32, 1e5, 1e-5),
    (np.float64, 1e10, 1e-13),  # implicit congruence goes indefinite in f64
])
def test_cholqr2i_breakdown_rescues_to_explicit_accuracy(dtype, kappa, rtol):
    """Where the implicit G₂ goes indefinite (κ²·eps ≳ 1 — κ ≈ 1e4 in f32,
    an ordinary condition number) the lax.cond rescue re-touches S through
    the explicit pass and recovers full κ·eps accuracy, instead of the old
    R = R₁ fallback's shift-grade ~3e-4 (ADVICE round 3, medium).  Measured
    here: implicit+rescue matches `cholqr2_r` bit-for-bit in every
    breakdown regime."""
    rng = np.random.default_rng(11)
    S = _conditioned(rng, 192, 24, kappa, dtype)
    R = np.asarray(cholqr2i_r(S), np.float64)
    G = np.asarray(S, np.float64).T @ np.asarray(S, np.float64)
    assert np.all(np.isfinite(R))
    err = np.linalg.norm(R.T @ R - G) / np.linalg.norm(G)
    assert err < rtol, err
    R_exp = np.asarray(cholqr2_r(S), np.float64)
    np.testing.assert_allclose(R, R_exp, rtol=0, atol=0)


def test_cholqr2_vmap_parity():
    rng = np.random.default_rng(2)
    S = jnp.asarray(rng.standard_normal((6, 64, 12)))
    Rb = jax.vmap(cholqr2_r)(S)
    for i in range(6):
        np.testing.assert_allclose(
            np.asarray(Rb[i]), np.asarray(cholqr2_r(S[i])), rtol=1e-12, atol=1e-14
        )


def test_cholqr2_bf16_roundtrip():
    rng = np.random.default_rng(3)
    S = jnp.asarray(rng.standard_normal((128, 8)), jnp.bfloat16)
    R = cholqr2_r(S)
    assert R.dtype == jnp.bfloat16
    G = np.asarray(S, np.float64).T @ np.asarray(S, np.float64)
    R64 = np.asarray(R, np.float64)
    assert np.linalg.norm(R64.T @ R64 - G) / np.linalg.norm(G) < 0.05


def test_cholqr2_operator_matches_dense():
    """hv/vhv through the cholqr2 R vs the dense JᵀJ + mu CᵀC — the
    reference's operator-identity pattern (`test/structures.jl:1-16`)."""
    rng = np.random.default_rng(4)
    J = jnp.asarray(rng.standard_normal((40, 9)))
    C = jnp.asarray(rng.standard_normal((3, 9)))
    mu = jnp.asarray(2.5)
    H = with_r_factor_cholqr2(AlHessian(J, C, mu))
    assert H.R is not None and H.G is None
    dense = np.asarray(J).T @ np.asarray(J) + 2.5 * np.asarray(C).T @ np.asarray(C)
    v = jnp.asarray(rng.standard_normal(9))
    np.testing.assert_allclose(np.asarray(hv(H, v)), dense @ np.asarray(v), rtol=1e-11)
    np.testing.assert_allclose(
        float(vhv(H, v)), float(np.asarray(v) @ dense @ np.asarray(v)), rtol=1e-11
    )


def test_operator_cholqr2_rescue_ill_conditioned_f32():
    """with_r_factor_cholqr2 (axis=None, the auto-selected f32 n>=64 route)
    recovers explicit-pass accuracy at κ(J)=1e4 f32 — the ordinary-κ
    regime where the implicit refinement breaks down (ADVICE r3 medium)."""
    rng = np.random.default_rng(12)
    J = _conditioned(rng, 384, 96, 1e4, np.float32)
    C = jnp.asarray(rng.standard_normal((2, 96)), jnp.float32)
    mu = jnp.asarray(1e-3, jnp.float32)
    H = jax.jit(lambda h: with_r_factor_cholqr2(h))(AlHessian(J, C, mu))
    R = np.asarray(H.R, np.float64)
    G = (np.asarray(J, np.float64).T @ np.asarray(J, np.float64)
         + 1e-3 * np.asarray(C, np.float64).T @ np.asarray(C, np.float64))
    err = np.linalg.norm(R.T @ R - G) / np.linalg.norm(G)
    # Old R=R1 fallback measured ~3e-4 here; the explicit rescue ~1e-7.
    assert err < 1e-5, err


def _medium_family(B=8, n=96, d=384, seed=5):
    from benlsip_tpu.batch.vmap_solve import BatchedProblem

    rng = np.random.default_rng(seed)
    J = jnp.asarray(rng.standard_normal((B, d, n)) / np.sqrt(d), jnp.float64)
    x_true = rng.standard_normal((B, n))
    y = jnp.einsum("bdn,bn->bd", J, jnp.asarray(x_true)) + 0.01 * jnp.asarray(
        rng.standard_normal((B, d))
    )
    bp = BatchedProblem(
        residuals=lambda x, th: th["J"] @ x - th["y"],
        jac_res=lambda x, th: th["J"],
        xl=jnp.full(n, -3.0),
        xu=jnp.full(n, 3.0),
    )
    return bp, {"J": J, "y": y}, jnp.zeros((B, n), jnp.float64)


@pytest.mark.slow
def test_solver_cholqr2_matches_qr_and_normal():
    """End-to-end batched solve: the three factorization routes agree."""
    from benlsip_tpu.batch.vmap_solve import solve_batched

    bp, theta, X0 = _medium_family()
    base = dict(max_outer_iter=12, max_inner_iter=60, gram_hessian="on")
    sols = {}
    for fact in ("cholqr2", "qr", "normal"):
        X, Y, info = solve_batched(bp, theta, X0, SolverOptions(**base, gn_factorization=fact))
        assert bool(jnp.all(info.converged)), fact
        sols[fact] = np.asarray(X)
    np.testing.assert_allclose(sols["cholqr2"], sols["qr"], rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(sols["cholqr2"], sols["normal"], rtol=1e-7, atol=1e-9)


# ---------- sharded mode (the lifted Householder ban) ----------

needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-virtual-device CPU mesh"
)


@needs_mesh
@pytest.mark.parametrize("layout", ["replicated", "sharded"])
def test_shardmap_cholqr2_matches_pjit(layout):
    from test_blocked_shardmap import _family

    from benlsip_tpu.dist.mesh import make_mesh
    from benlsip_tpu.dist.sharded import (
        solve_large_blocked_family,
        solve_large_blocked_shardmap,
    )

    bp, theta, x0, n, d = _family()
    mesh = make_mesh(batch=1, block=8)
    opts = SolverOptions(
        max_outer_iter=8, max_inner_iter=40,
        gn_factorization="cholqr2", gram_layout=layout,
    )
    x_s, y_s, i_s = solve_large_blocked_shardmap(bp, theta, x0, opts, mesh)
    x_p, y_p, i_p = solve_large_blocked_family(
        bp, theta, x0, dataclasses.replace(opts, gram_layout="replicated"), mesh
    )
    assert bool(i_s.converged) and bool(i_p.converged)
    np.testing.assert_allclose(np.asarray(x_s), np.asarray(x_p), rtol=1e-8, atol=1e-10)


@needs_mesh
def test_shardmap_cholqr2_collective_mix_is_psum_only():
    """The distributed cholqr2 program must reduce Grams (all-reduce) and
    NEVER gather the Jacobian — the property that makes the orthogonal
    route available under shard_map at all."""
    from bench_scaling import collective_stats
    from test_blocked_shardmap import _family

    from benlsip_tpu.dist.mesh import make_mesh
    from benlsip_tpu.dist.sharded import _blocked_shardmap_runner
    from jax.sharding import NamedSharding, PartitionSpec as P

    bp, theta, x0, n, d = _family()
    mesh = make_mesh(batch=1, block=8)
    opts = dataclasses.replace(
        SolverOptions(max_outer_iter=4, max_inner_iter=8),
        spmd_axis="block",
        gram_hessian="on",
        gn_factorization="cholqr2",
    )
    poly = bp.polyhedron(n, x0.dtype)
    fns_key = (bp.residuals, bp.nlconstraints, bp.jac_res, bp.jac_nlcons)
    runner = _blocked_shardmap_runner(fns_key, opts, mesh)
    theta_p = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("block", *([None] * (a.ndim - 1)))))
        if a.ndim >= 1 and a.shape[0] % 8 == 0
        else jax.device_put(a, NamedSharding(mesh, P())),
        theta,
    )
    counts, _ = collective_stats(runner.lower(poly, x0, theta_p).compile().as_text())
    assert set(counts) <= {"all-reduce"}, counts
    assert counts.get("all-reduce", 0) > 0
