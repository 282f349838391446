"""Pallas batched-linalg kernels vs jnp/numpy ground truth (the reference's
fancy-kernel-vs-naive-recompute oracle pattern, SURVEY.md §4(b)).

On CPU the kernels run in interpreter mode; the same code compiles via
Mosaic on TPU (exercised by the bench/verify drives).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from benlsip_tpu.kernels.batched_linalg import (
    batched_cho_solve,
    batched_cholesky,
    batched_thin_qr,
)

INTERPRET = jax.devices()[0].platform == "cpu"
rng = np.random.default_rng(3)


def spd_batch(B, M, dtype=np.float32):
    A = rng.standard_normal((B, M, M)).astype(dtype)
    return A @ np.transpose(A, (0, 2, 1)) + M * np.eye(M, dtype=dtype)


@pytest.mark.parametrize("M", [1, 2, 3, 5, 8])
def test_batched_cholesky_matches_numpy(M):
    B = 200  # deliberately not lane-aligned (exercises padding)
    K = spd_batch(B, M)
    L = np.asarray(batched_cholesky(jnp.asarray(K), interpret=INTERPRET))
    L_ref = np.linalg.cholesky(K)
    np.testing.assert_allclose(L, L_ref, rtol=2e-5, atol=2e-5)
    # strict lower-triangular structure
    assert np.all(np.triu(L, 1) == 0)


@pytest.mark.parametrize("M", [1, 3, 6])
def test_batched_cho_solve_matches_numpy(M):
    B = 130
    K = spd_batch(B, M)
    L = np.linalg.cholesky(K)
    b = rng.standard_normal((B, M)).astype(np.float32)
    x = np.asarray(batched_cho_solve(jnp.asarray(L), jnp.asarray(b), interpret=INTERPRET))
    x_ref = np.linalg.solve(K, b[..., None])[..., 0]
    np.testing.assert_allclose(x, x_ref, rtol=3e-4, atol=3e-5)


@pytest.mark.parametrize("D,N", [(8, 3), (32, 3), (16, 8)])
def test_batched_thin_qr(D, N):
    B = 140
    A = rng.standard_normal((B, D, N)).astype(np.float32)
    Q, R = batched_thin_qr(jnp.asarray(A), interpret=INTERPRET)
    Q, R = np.asarray(Q), np.asarray(R)
    # QR reproduces A, Q orthonormal, R upper-triangular w/ positive diag.
    np.testing.assert_allclose(Q @ R, A, rtol=1e-4, atol=1e-4)
    eye = np.eye(N, dtype=np.float32)
    gram = np.transpose(Q, (0, 2, 1)) @ Q
    np.testing.assert_allclose(gram, np.broadcast_to(eye, (B, N, N)), atol=2e-4)
    assert np.all(np.tril(R, -1) == 0)
    assert np.all(np.diagonal(R, axis1=1, axis2=2) > 0)


def test_empty_and_degenerate_batches():
    assert batched_cholesky(jnp.zeros((0, 3, 3)), interpret=INTERPRET).shape == (0, 3, 3)
    assert batched_cho_solve(
        jnp.zeros((4, 0, 0)), jnp.zeros((4, 0)), interpret=INTERPRET
    ).shape == (4, 0)
