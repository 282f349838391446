"""Cholesky factorizations for masked active-set projections.

TPU-native replacement for the reference's augmented-Cholesky machinery
(`/root/reference/src/polyhedral_constraints.jl:35-68`) and its LAPACK
backend (dpotrf/dtrsm via Julia `cholesky` / `\\`).

Mathematical background
-----------------------
The reference projects onto {v : Av = 0, v_i = 0 for i fixed} via the normal
equations of Ã = [A; E], E = rows e_iᵀ of fixed variables, factorizing

    ÃÃᵀ = [AAᵀ  AEᵀ]      with the block trick  L = [L_A      0  ]
          [EAᵀ   I ]                                [Gᵀ   chol(I-GᵀG)]

where G = L_A⁻¹ A Eᵀ (ref :35-59).  The Schur complement of the identity
block is  AAᵀ - AEᵀEAᵀ = A (I - EᵀE) Aᵀ = A Z Aᵀ  with Z = diag(free mask).
Hence ÃÃᵀ is SPD iff A Z Aᵀ is SPD, and the subspace projection

    P r = Z r - Z Aᵀ (A Z Aᵀ)⁻¹ A Z r

is *identical* to the reference's augmented normal-equations projection but
needs only a fixed-size m×m factorization — no growing shapes, so it jits,
vmaps over instances with divergent active sets, and (for the sharded
large-instance mode) A Z Aᵀ is a row-sharded GEMM + psum.

`cholesky_aug_aat_dense` below reproduces the reference's dynamic-shape
block factorization with numpy for use as a host-side parity oracle in tests
(the reference's own unit test compares against a greedy chol(BBᵀ),
`/root/reference/test/structures.jl:18-35`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.custom_batching import custom_vmap

Array = jax.Array

# The batch-on-lanes Pallas kernels win when the factor is small (fully
# unrolled straight-line VPU code) and the batch is wide; above this size
# XLA's blocked lowering is the right tool.
_PALLAS_MAX_M = 16
_PALLAS_DTYPES = (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16))
_BF16 = jnp.dtype(jnp.bfloat16)


def _chol_xla(K: Array) -> Array:
    """bf16-safe XLA Cholesky: no backend ships a bf16 kernel (LAPACK on
    CPU, the blocked lowering on TPU are f32/f64 only), so bf16 inputs
    factor in f32 and round back — matching the Pallas kernels'
    accumulation precision (the bf16-bulk pipeline's dtype story)."""
    if K.dtype == _BF16:
        return jnp.linalg.cholesky(K.astype(jnp.float32)).astype(K.dtype)
    return jnp.linalg.cholesky(K)


def _tri_solve_xla(L: Array, b: Array, **kw) -> Array:
    """bf16-safe triangular solve (same reasoning as `_chol_xla`)."""
    if L.dtype == _BF16:
        return jax.scipy.linalg.solve_triangular(
            L.astype(jnp.float32), b.astype(jnp.float32), **kw
        ).astype(L.dtype)
    return jax.scipy.linalg.solve_triangular(L, b, **kw)


@custom_vmap
def _chol_small(K: Array) -> Array:
    """Single m×m SPD Cholesky; batching dispatches to the Pallas kernel.

    This is where the reference's LAPACK dpotrf surface meets the TPU:
    unbatched (or on CPU) it is XLA's `jnp.linalg.cholesky`; under `vmap`
    over instances — the batched-small regime, where XLA lowers tiny
    factorizations to scalar loops — the vmap rule routes to the
    batch-on-lanes Pallas kernel (`kernels/batched_linalg.batched_cholesky`)
    with the batch on the 128-wide vector lanes.
    """
    return _chol_xla(K)


@_chol_small.def_vmap
def _chol_small_vmap(axis_size, in_batched, K):
    (kb,) = in_batched
    if not kb:
        K = jnp.broadcast_to(K, (axis_size,) + K.shape)
    M = K.shape[-1]
    if K.ndim == 3 and 0 < M <= _PALLAS_MAX_M and K.dtype in _PALLAS_DTYPES:
        from ..kernels.batched_linalg import batched_cholesky

        out = lax.platform_dependent(K, cpu=_chol_xla, default=batched_cholesky)
    else:
        out = _chol_xla(K)
    return out, True


@custom_vmap
def _cho_solve_small(L: Array, b: Array) -> Array:
    """Solve (L Lᵀ) x = b for one small factor; batching → Pallas kernel."""
    y = _tri_solve_xla(L, b, lower=True)
    return _tri_solve_xla(L.T, y, lower=False)


@_cho_solve_small.def_vmap
def _cho_solve_small_vmap(axis_size, in_batched, L, b):
    lb, bb = in_batched
    if not lb:
        L = jnp.broadcast_to(L, (axis_size,) + L.shape)
    if not bb:
        b = jnp.broadcast_to(b, (axis_size,) + b.shape)
    M = L.shape[-1]
    if L.ndim == 3 and b.ndim == 2 and 0 < M <= _PALLAS_MAX_M and L.dtype in _PALLAS_DTYPES:
        from ..kernels.batched_linalg import batched_cho_solve

        def _xla(args):
            L_, b_ = args
            y = _tri_solve_xla(L_, b_[..., None], lower=True)
            return _tri_solve_xla(jnp.swapaxes(L_, -1, -2), y, lower=False)[..., 0]

        out = lax.platform_dependent(
            (L, b), cpu=_xla, default=lambda args: batched_cho_solve(*args)
        )
    else:
        y = _tri_solve_xla(L, b[..., None], lower=True)
        out = _tri_solve_xla(jnp.swapaxes(L, -1, -2), y, lower=False)[..., 0]
    return out, True


def masked_aat(A: Array, free: Array) -> Array:
    """A Z Aᵀ with Z = diag(free). Shape (m, m)."""
    Af = A * free.astype(A.dtype)[None, :]
    return Af @ A.T


def factor_masked_aat(A: Array, free: Array, reg: float = 0.0) -> Array:
    """Lower Cholesky factor of A Z Aᵀ (+ reg·I).

    Fixed-shape replacement for `cholesky_aug_aat` + `update_chol!`
    (ref `src/polyhedral_constraints.jl:35-68`).  m is small in the batched
    regime (m ≤ n ≤ ~20), so the O(m²n) re-formation + O(m³) factorization is
    cheaper on TPU than a data-dependent incremental update would be.

    reg > 0 adds Tikhonov jitter for near-rank-deficient masked rows; the
    reference simply crashes in that case (LAPACK PosDefException).
    """
    m = A.shape[0]
    if m == 0:
        return jnp.zeros((0, 0), dtype=A.dtype)
    K = masked_aat(A, free)
    if reg:
        K = K + jnp.asarray(reg, A.dtype) * jnp.eye(m, dtype=A.dtype)
    return _chol_small(K)


def cho_solve_lower(L: Array, b: Array) -> Array:
    """Solve (L Lᵀ) x = b given the lower factor L.

    The reference's pair of triangular solves `chol.L \\ b; chol.U \\ v`
    (e.g. ref `src/basic_tralcnlss.jl:897-901`,
    `src/polyhedral_constraints.jl:114-116`).  Vector right-hand sides go
    through the custom-vmap wrapper so instance batches hit the Pallas
    batched forward/backward substitution kernel on TPU.
    """
    if b.ndim == 1:
        return _cho_solve_small(L, b)
    y = _tri_solve_xla(L, b, lower=True)
    return _tri_solve_xla(L.T, y, lower=False)


def cholesky_aug_aat_dense(A: np.ndarray, fixed: np.ndarray, L_aat: np.ndarray) -> np.ndarray:
    """Host-side (numpy, dynamic-shape) reproduction of the reference's
    blocked augmented factorization, for parity tests only.

    Mirrors `cholesky_aug_aat` (ref `src/polyhedral_constraints.jl:35-59`):
    given L_aat = chol(AAᵀ).L, returns the lower factor of ÃÃᵀ where
    Ã = [A; e_iᵀ for i fixed], via  G = L_aat⁻¹ A[:, fixed] and the Schur
    block chol(I - GᵀG).
    """
    A = np.asarray(A)
    fixed = np.asarray(fixed, dtype=bool)
    m = A.shape[0]
    p = int(fixed.sum())
    L = np.zeros((m + p, m + p), dtype=A.dtype)
    G = np.linalg.solve(L_aat, A[:, fixed]) if p else np.zeros((m, 0), dtype=A.dtype)
    L[:m, :m] = L_aat
    L[m:, :m] = G.T
    if p:
        H = np.eye(p, dtype=A.dtype) - G.T @ G
        L[m:, m:] = np.linalg.cholesky(H)
    return L
