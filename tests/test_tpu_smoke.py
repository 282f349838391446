"""Real-chip Pallas smoke tests (compiled Mosaic, NOT interpret mode).

Round-1 VERDICT weak-5: the CPU-forced suite only ever runs the Pallas
kernels under `interpret=True`, so a Mosaic lowering regression is first
seen by a bench run on the chip.  These tests compile the kernels for the
actual TPU backend and are skipped everywhere else:

    BENLSIP_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

(conftest.py leaves the platform alone when BENLSIP_TPU_TESTS=1).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.tpu


def _tpu_device():
    # The chip may be exposed through a differently-named plugin backend
    # (e.g. "axon" in this image), so match on the device kind, not the
    # backend name.
    try:
        for d in jax.devices():
            if "tpu" in (d.device_kind or "").lower() or d.platform == "tpu":
                return d
    except RuntimeError:
        pass
    return None


requires_tpu = pytest.mark.skipif(_tpu_device() is None, reason="no TPU chip attached")


@requires_tpu
def test_batched_cholesky_compiled_on_chip():
    from benlsip_tpu.kernels.batched_linalg import batched_cholesky

    rng = np.random.default_rng(0)
    B, M = 256, 8
    G = rng.standard_normal((B, M, M)).astype(np.float32)
    K = G @ np.transpose(G, (0, 2, 1)) + 4.0 * np.eye(M, dtype=np.float32)
    dev = _tpu_device()
    Kd = jax.device_put(jnp.asarray(K), dev)
    L = jax.jit(batched_cholesky)(Kd)          # compiled Mosaic, no interpret
    L_h = np.asarray(L)
    ref = np.linalg.cholesky(K.astype(np.float64))
    np.testing.assert_allclose(L_h, ref, rtol=2e-4, atol=2e-4)


@requires_tpu
def test_batched_thin_qr_compiled_on_chip():
    from benlsip_tpu.kernels.batched_linalg import batched_thin_qr

    rng = np.random.default_rng(1)
    B, D, N = 256, 32, 6
    A = rng.standard_normal((B, D, N)).astype(np.float32)
    dev = _tpu_device()
    Q, R = jax.jit(batched_thin_qr)(jax.device_put(jnp.asarray(A), dev))
    Q_h, R_h = np.asarray(Q), np.asarray(R)
    # QR reconstructs A; Q orthonormal; R upper-triangular.
    np.testing.assert_allclose(Q_h @ R_h, A, rtol=2e-4, atol=2e-4)
    eye = np.broadcast_to(np.eye(N, dtype=np.float32), (B, N, N))
    np.testing.assert_allclose(np.transpose(Q_h, (0, 2, 1)) @ Q_h, eye, atol=5e-4)
    assert np.allclose(np.tril(R_h, -1), 0.0, atol=1e-6)


@requires_tpu
def test_solver_f32_end_to_end_on_chip():
    # The whole jitted solve (while_loops, masked factors, projections) as
    # one compiled TPU program — the bench path's shape, in miniature.
    from benlsip_tpu import SolverOptions, solve
    from benlsip_tpu.problems import sphere_regression as sr

    x, y, info = solve(
        sr.make_problem(dtype=jnp.float32),
        sr.x0(dtype=jnp.float32),
        SolverOptions(max_outer_iter=40, max_inner_iter=120),
    )
    assert bool(info.converged)
    np.testing.assert_allclose(
        np.asarray(x), [1.3747, 0.0876, 1.0500], atol=2e-3
    )


@requires_tpu
def test_certify_device_on_chip_matches_host_grade():
    # certify="device": the f64 certification phase runs ON the chip
    # (QR-factored polish under f64 emulation); solutions must certify to
    # the same f64 KKT grade as the host path.
    import jax.numpy as jnp

    from benlsip_tpu.batch.refine import solve_mixed_precision
    from benlsip_tpu.problems.generators import exp_fit_family
    from benlsip_tpu.solver.options import SolverOptions

    B = 128
    bp, theta, X0 = exp_fit_family(B, d=32, seed=21, dtype=jnp.float64)
    opts = SolverOptions(max_outer_iter=40, max_inner_iter=120)
    Xd, Yd, id_ = solve_mixed_precision(bp, theta, X0, opts, chunk=B, certify="device")
    Xh, Yh, ih = solve_mixed_precision(bp, theta, X0, opts, chunk=B, certify="host")
    conv_d = np.asarray(id_.converged)
    conv_h = np.asarray(ih.converged)
    assert conv_d.mean() == 1.0 and conv_h.mean() == 1.0
    np.testing.assert_allclose(np.asarray(Xd), np.asarray(Xh), atol=1e-7)
