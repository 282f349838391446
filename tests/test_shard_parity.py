"""Single-chip vs sharded parity on a fake 8-device CPU mesh (SURVEY.md §4:
the distributed test tier the reference lacks).  conftest.py forces
xla_force_host_platform_device_count=8."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from benlsip_tpu import Problem
from benlsip_tpu.batch.vmap_solve import solve_batched
from benlsip_tpu.dist.mesh import make_mesh
from benlsip_tpu.dist.sharded import solve_batched_sharded, solve_large_blocked
from benlsip_tpu.problems.generators import exp_fit_family, sphere_family
from benlsip_tpu.solver.options import SolverOptions

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def test_dp_sharded_matches_single_device():
    B = 32
    bp, theta, X0 = sphere_family(B, seed=11)
    opts = SolverOptions(max_outer_iter=60, max_inner_iter=200)
    X_ref, Y_ref, i_ref = solve_batched(bp, theta, X0, opts)

    mesh = make_mesh(batch=8, block=1)
    X_sh, Y_sh, i_sh = solve_batched_sharded(bp, theta, X0, opts, mesh)
    # Same per-instance program and data, but XLA tiles the batched GEMMs
    # differently at per-device batch 4 vs 32, so agreement is to solver
    # tolerance rather than bitwise.
    np.testing.assert_allclose(np.asarray(X_sh), np.asarray(X_ref), rtol=1e-6, atol=1e-8)
    np.testing.assert_array_equal(np.asarray(i_sh.converged), np.asarray(i_ref.converged))


def test_tp_blocked_medium_instance_converges():
    # Config-4 shape at CI scale: one n=256/d=1024 instance, rows sharded
    # 8 ways (a n=2048/d=8192 run solves in 3 outer iterations, see git log).
    n, d, m = 256, 1024, 4
    rng = np.random.default_rng(17)
    J = jnp.asarray(rng.standard_normal((d, n)) / np.sqrt(d))
    x_true = rng.standard_normal(n)
    y = J @ jnp.asarray(x_true) + 0.01 * jnp.asarray(rng.standard_normal(d))
    A = jnp.asarray(rng.standard_normal((m, n)) / np.sqrt(n))
    problem = Problem(
        residuals=lambda x: J @ x - y,
        jac_res=lambda x: J,
        A=A,
        b=A @ jnp.asarray(x_true),
        xl=jnp.full(n, -3.0),
        xu=jnp.full(n, 3.0),
    )
    mesh = make_mesh(batch=1, block=8)
    opts = SolverOptions(max_outer_iter=10, max_inner_iter=60)
    x, yl, info = solve_large_blocked(problem, jnp.zeros(n), opts, mesh)
    assert bool(info.converged)
    rel = float(jnp.linalg.norm(x - jnp.asarray(x_true)) / np.linalg.norm(x_true))
    assert rel < 0.1  # regularized LSQ with noise: close to ground truth


def test_tp_blocked_jacobian_matches_single_device():
    # One medium instance, residual dimension sharded over 4 chips.
    n, d, m = 24, 64, 2
    rng = np.random.default_rng(5)
    J = jnp.asarray(rng.standard_normal((d, n)) / np.sqrt(d))
    x_true = rng.standard_normal(n)
    y = jnp.asarray(J @ x_true + 0.01 * rng.standard_normal(d))
    A = jnp.asarray(rng.standard_normal((m, n)) / np.sqrt(n))
    b = A @ jnp.asarray(x_true)

    problem = Problem(
        residuals=lambda x: J @ x - y,
        jac_res=lambda x: J,
        A=A,
        b=b,
        xl=jnp.full(n, -2.0),
        xu=jnp.full(n, 2.0),
    )
    x0 = jnp.zeros(n)
    opts = SolverOptions(max_outer_iter=10, max_inner_iter=60)

    from benlsip_tpu.solver.api import solve

    x_ref, y_ref, i_ref = solve(problem, x0, opts)

    mesh = make_mesh(batch=2, block=4)
    x_sh, y_sh, i_sh = solve_large_blocked(problem, x0, opts, mesh)
    # Row-sharded contractions reduce in a different order -> tolerance, not
    # bitwise.
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref), rtol=1e-8, atol=1e-10)
    assert bool(i_sh.converged) == bool(i_ref.converged)

    # The data-as-arguments family path (no program literals; the transport
    # rejects closure-captured HBM-scale Jacobians) must agree too.
    from benlsip_tpu.batch.vmap_solve import BatchedProblem
    from benlsip_tpu.dist.sharded import solve_large_blocked_family

    bp = BatchedProblem(
        residuals=lambda x, th: th["J"] @ x - th["y"],
        jac_res=lambda x, th: th["J"],
        A=A,
        b=b,
        xl=jnp.full(n, -2.0),
        xu=jnp.full(n, 2.0),
    )
    x_f, y_f, i_f = solve_large_blocked_family(bp, {"J": J, "y": y}, x0, opts, mesh)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref), rtol=1e-8, atol=1e-10)
    assert bool(i_f.converged) == bool(i_ref.converged)
