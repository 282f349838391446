"""QR factorizations for the Gauss-Newton algebra.

TPU-native replacement for the half of the reference's LAPACK surface the
normal equations hide: the reference factorizes CCᵀ (Cholesky) for the
least-squares multipliers (`/root/reference/src/basic_tralcnlss.jl:897-901`)
and applies JᵀJ + mu·CᵀC matrix-free everywhere else — both of which square
the Jacobian's condition number.  On TPU the f32 bulk phase of the
mixed-precision pipeline has no κ² headroom (see SolverOptions), so the
framework offers the orthogonal route: thin QR of the stacked factor, with
R replacing the Gram matrix (RᵀR = SᵀS exactly, but R is accurate to
κ(S)·eps instead of κ(S)²·eps).

Dispatch follows ops/cholesky.py: unbatched (or on CPU) these are XLA's
blocked-Householder `jnp.linalg.qr`; under `vmap` over instances with a
small column count, the vmap rule routes to the batch-on-lanes Pallas MGS
kernel (`kernels/batched_linalg.batched_thin_qr`) whose per-instance work
is straight-line VPU code with the batch on the 128-wide lanes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.custom_batching import custom_vmap

Array = jax.Array

# The MGS kernel fully unrolls the N(N+1)/2 column updates; beyond this
# column count XLA's blocked Householder lowering is the right tool.  The
# row (D) bound keeps the (N, D, block) VMEM slab within budget.
_PALLAS_MAX_N = 16
_PALLAS_MAX_D = 2048
_PALLAS_DTYPES = (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16))


def _pallas_eligible(shape, dtype) -> bool:
    if len(shape) != 3:
        return False
    _, D, N = shape
    return 0 < N <= _PALLAS_MAX_N and N <= D <= _PALLAS_MAX_D and jnp.dtype(dtype) in _PALLAS_DTYPES


def _xla_qr(S: Array, mode: str):
    """jnp.linalg.qr with bf16 handled by an f32 round trip.

    No backend ships a bf16 QR kernel (LAPACK on CPU, the Householder
    lowering on TPU are f32/f64 only) — a bf16 input crashes at trace time.
    Computing in f32 and rounding back matches the Pallas MGS kernel's
    accumulation precision.
    """
    S32 = S.astype(jnp.float32) if S.dtype == jnp.dtype(jnp.bfloat16) else S
    out = jnp.linalg.qr(S32, mode=mode)
    if mode == "r":
        return out.astype(S.dtype)
    # Plain tuple, not the QRResult NamedTuple: the Pallas branch of
    # lax.platform_dependent returns a tuple and pytree structures must match.
    return out[0].astype(S.dtype), out[1].astype(S.dtype)


@custom_vmap
def thin_qr(S: Array):
    """Thin QR of one (D, N) matrix -> (Q (D, K), R (K, N)), K = min(D, N).

    Batching over instances dispatches to the Pallas MGS kernel when the
    column count is small (the batched-small regime: N = p or n ≤ ~16).
    """
    q, r = _xla_qr(S, "reduced")
    return q, r


@thin_qr.def_vmap
def _thin_qr_vmap(axis_size, in_batched, S):
    (sb,) = in_batched
    if not sb:
        S = jnp.broadcast_to(S, (axis_size,) + S.shape)
    if _pallas_eligible(S.shape, S.dtype):
        from ..kernels.batched_linalg import batched_thin_qr

        def _xla(a):
            return _xla_qr(a, "reduced")

        out = lax.platform_dependent(S, cpu=_xla, default=batched_thin_qr)
    else:
        out = _xla_qr(S, "reduced")
    return out, (True, True)


@custom_vmap
def qr_r(S: Array) -> Array:
    """R factor only of one (D, N) matrix -> (K, N), K = min(D, N).

    RᵀR = SᵀS: the orthogonal-factorization route to the Gram operator.
    Batched small-N instances hit the Pallas kernel (Q discarded — the MGS
    kernel materializes it in VMEM anyway; the HBM write is what's saved).
    """
    return _xla_qr(S, "r")


@qr_r.def_vmap
def _qr_r_vmap(axis_size, in_batched, S):
    (sb,) = in_batched
    if not sb:
        S = jnp.broadcast_to(S, (axis_size,) + S.shape)
    if _pallas_eligible(S.shape, S.dtype):
        from ..kernels.batched_linalg import batched_thin_qr

        out = lax.platform_dependent(
            S,
            cpu=lambda a: _xla_qr(a, "r"),
            default=lambda a: batched_thin_qr(a)[1],
        )
    else:
        out = _xla_qr(S, "r")
    return out, True
