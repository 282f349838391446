"""Pallas TPU kernels for batched small-matrix linear algebra.

TPU-native replacement for the reference's LAPACK surface (dpotrf/dtrsv —
SURVEY.md §2.4): the batched-small regime factorizes thousands of tiny
SPD matrices (the A Z Aᵀ projection factors, m ≤ ~16) per solver step.
XLA's `jnp.linalg.cholesky` lowers small batched factorizations to scalar
loops; these kernels instead put the *batch* on the 128-wide vector lanes
— arrays are laid out batch-last, (M, M, B) — and fully unroll the small
M dimension, so every operation is a (B,)-wide VPU op and a batch of B
factorizations costs M(M+1)/2 vector ops regardless of B.

All kernels are dtype-polymorphic over f32/bf16 (TPU-native); f64 parity
testing runs them in interpreter mode on CPU.

Layout note: callers hold (B, M, M)/(B, M) arrays; the public wrappers
transpose at the boundary (cheap for small M) and pick a lane-aligned
batch block.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANE = 128


def _zero(i):
    # Index-map zero derived from the grid index: a literal 0 canonicalizes
    # to i64 under jax_enable_x64 while the grid index stays i32, and Mosaic
    # rejects the mixed-width index tuple ("failed to legalize func.return").
    return i - i


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _cholesky_kernel(M: int, k_ref, l_ref):
    """Unrolled Cholesky–Banachiewicz over (M, M, BB) batch-last blocks.

    Each `[i, j]` read/write is a (BB,)-vector; the i/j loops are Python
    (static M) so the kernel is straight-line VPU code.
    """
    col = [[None] * M for _ in range(M)]
    for j in range(M):
        acc = k_ref[j, j, :]
        for k in range(j):
            acc = acc - col[j][k] * col[j][k]
        # No pivot clamping: a non-SPD pivot must produce NaN exactly like
        # LAPACK/jnp.linalg.cholesky so callers see the same failure signal
        # on TPU and CPU (clamping would return finite garbage factors).
        d = jnp.sqrt(acc)
        col[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, M):
            s = k_ref[i, j, :]
            for k in range(j):
                s = s - col[i][k] * col[j][k]
            col[i][j] = s * inv_d
    for i in range(M):
        for j in range(M):
            if j <= i:
                l_ref[i, j, :] = col[i][j]
            else:
                l_ref[i, j, :] = jnp.zeros_like(k_ref[i, j, :])


def batched_cholesky(K: Array, block: int = 1024, interpret: bool = False) -> Array:
    """Lower Cholesky factors of a batch of SPD matrices.

    K: (B, M, M) -> L: (B, M, M), L @ Lᵀ = K.  Pallas on TPU; set
    interpret=True on CPU (tests).
    """
    B, M, _ = K.shape
    if M == 0 or B == 0:
        return jnp.zeros_like(K)
    Kt = jnp.moveaxis(K, 0, -1)  # (M, M, B)
    Bp = _round_up(B, _LANE)
    if Bp != B:
        Kt = jnp.pad(Kt, ((0, 0), (0, 0), (0, Bp - B)), constant_values=1.0)
    block = min(block, Bp)
    grid = (Bp // block,)

    out = pl.pallas_call(
        functools.partial(_cholesky_kernel, M),
        out_shape=jax.ShapeDtypeStruct((M, M, Bp), K.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((M, M, block), lambda i: (_zero(i), _zero(i), i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M, M, block), lambda i: (_zero(i), _zero(i), i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(Kt)
    return jnp.moveaxis(out[:, :, :B], -1, 0)


def _cho_solve_kernel(M: int, l_ref, b_ref, x_ref):
    """Solve (L Lᵀ) x = b, unrolled forward+backward substitution."""
    y = [None] * M
    for i in range(M):
        acc = b_ref[i, :]
        for k in range(i):
            acc = acc - l_ref[i, k, :] * y[k]
        y[i] = acc / l_ref[i, i, :]
    x = [None] * M
    for i in reversed(range(M)):
        acc = y[i]
        for k in range(i + 1, M):
            acc = acc - l_ref[k, i, :] * x[k]
        x[i] = acc / l_ref[i, i, :]
    for i in range(M):
        x_ref[i, :] = x[i]


def batched_cho_solve(L: Array, b: Array, block: int = 1024, interpret: bool = False) -> Array:
    """Solve L Lᵀ x = b for a batch: L (B, M, M), b (B, M) -> x (B, M)."""
    B, M, _ = L.shape
    if M == 0 or B == 0:
        return jnp.zeros_like(b)
    Lt = jnp.moveaxis(L, 0, -1)            # (M, M, B)
    bt = jnp.moveaxis(b, 0, -1)            # (M, B)
    Bp = _round_up(B, _LANE)
    if Bp != B:
        Lt = jnp.pad(Lt, ((0, 0), (0, 0), (0, Bp - B)), constant_values=1.0)
        bt = jnp.pad(bt, ((0, 0), (0, Bp - B)))
    block = min(block, Bp)
    grid = (Bp // block,)

    out = pl.pallas_call(
        functools.partial(_cho_solve_kernel, M),
        out_shape=jax.ShapeDtypeStruct((M, Bp), L.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, M, block), lambda i: (_zero(i), _zero(i), i), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, block), lambda i: (_zero(i), i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, block), lambda i: (_zero(i), i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(Lt, bt)
    return jnp.moveaxis(out[:, :B], -1, 0)


def _mgs_qr_kernel(D: int, N: int, a_ref, q_ref, r_ref):
    """Thin QR of a batch of (D, N) matrices via modified Gram-Schmidt.

    Layout (N, D, B): column j of every instance is the (D, B) slab
    a_ref[j]; dot products reduce over the sublane (D) axis, staying
    (B,)-wide on the lanes.  N is small (parameter count), D moderate.
    """
    eps = jnp.finfo(a_ref.dtype).tiny
    q = [None] * N
    for j in range(N):
        v = a_ref[j, :, :]                                   # (D, B)
        for k in range(j):
            rkj = jnp.sum(q[k] * v, axis=0, keepdims=True)   # (1, B)
            r_ref[k, j, :] = rkj[0]
            v = v - q[k] * rkj
        nrm = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=0, keepdims=True), eps))
        r_ref[j, j, :] = nrm[0]
        q[j] = v / nrm
        q_ref[j, :, :] = q[j]
        for k in range(j + 1, N):
            r_ref[k, j, :] = jnp.zeros_like(nrm[0])


def batched_thin_qr(A: Array, block: int = 512, interpret: bool = False):
    """Thin QR of a batch: A (B, D, N) -> (Q (B, D, N), R (B, N, N)).

    The QR-based Gauss-Newton path (BASELINE north_star "QR+PCG"): better
    conditioned than the JᵀJ normal equations for κ(J)² regimes.
    """
    B, D, N = A.shape
    if B == 0 or N == 0:
        return jnp.zeros_like(A), jnp.zeros((B, N, N), A.dtype)
    At = jnp.transpose(A, (2, 1, 0))       # (N, D, B)
    Bp = _round_up(B, _LANE)
    if Bp != B:
        At = jnp.pad(At, ((0, 0), (0, 0), (0, Bp - B)))
    block = min(block, Bp)
    grid = (Bp // block,)

    q, r = pl.pallas_call(
        functools.partial(_mgs_qr_kernel, D, N),
        out_shape=(
            jax.ShapeDtypeStruct((N, D, Bp), A.dtype),
            jax.ShapeDtypeStruct((N, N, Bp), A.dtype),
        ),
        grid=grid,
        in_specs=[pl.BlockSpec((N, D, block), lambda i: (_zero(i), _zero(i), i), memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((N, D, block), lambda i: (_zero(i), _zero(i), i), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N, block), lambda i: (_zero(i), _zero(i), i), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(At)
    Q = jnp.transpose(q[:, :, :B], (2, 1, 0))
    R = jnp.transpose(r[:, :, :B], (2, 0, 1))  # r holds R[row, col] batch-last
    return Q, R
