"""Problem-fixture solves: Rosenbrock (config 1) and HS48."""
import numpy as np
import jax
import jax.numpy as jnp

from benlsip_tpu import SolverOptions, solve
from benlsip_tpu.problems import hs48, rosenbrock


def test_rosenbrock_bounded():
    x, y, info = solve(rosenbrock.make_problem(), rosenbrock.x0())
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(x), [1.0, 1.0], atol=1e-7)


def test_rosenbrock_chained():
    n = 12
    x, y, info = solve(rosenbrock.make_chained(n), jnp.full((n,), -1.0))
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(x), np.ones(n), atol=1e-6)


def test_hs48():
    x, y, info = solve(hs48.make_problem(), hs48.x0())
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(x), np.asarray(hs48.x_star()), atol=1e-7)
    # Linear feasibility at the solution.
    A, b = np.asarray(hs48.A), np.asarray(hs48.b)
    np.testing.assert_allclose(A @ np.asarray(x), b, atol=1e-10)


def test_blocked_hard_family_small_scale():
    """Config-4 hardened workload (VERDICT r4 #5) at CPU scale: nonlinear,
    10+ TR iterations, a real active set at the solution, and the
    independent oracle agreeing at f32 grade."""
    import numpy as np

    from benlsip_tpu.baselines.kkt_oracle import kkt_check_point
    from benlsip_tpu.dist.mesh import make_mesh
    from benlsip_tpu.dist.sharded import solve_large_blocked_family
    from benlsip_tpu.problems.generators import blocked_hard_family
    from benlsip_tpu.solver.options import SolverOptions

    alpha = 1.5
    bp, theta, x0 = blocked_hard_family(n=256, d=1024, seed=0, dtype=jnp.float32)
    mesh = make_mesh(batch=1, block=1, devices=jax.devices()[:1])
    opts = SolverOptions(max_outer_iter=20, max_inner_iter=60)
    x, yl, info = solve_large_blocked_family(bp, theta, x0, opts, mesh)
    assert bool(info.converged), (float(info.pix), int(info.status))
    assert int(info.inner_iters) >= 10, int(info.inner_iters)  # a real TR schedule
    xn = np.asarray(x, np.float64)
    act = ((xn - np.asarray(bp.xl) < 1e-6) | (np.asarray(bp.xu) - xn < 1e-6)).mean()
    assert act > 0.25, act  # bound-active at the solution
    J0 = np.asarray(theta["J"], np.float64)
    y64 = np.asarray(theta["y"], np.float64)
    dpsi = 1.0 + 3 * alpha * xn * xn
    r = J0 @ (xn + alpha * xn**3) - y64
    orc = kkt_check_point(
        xn, r, J0 * dpsi[None, :], None, None,
        np.asarray(bp.A, np.float64), np.asarray(bp.b, np.float64),
        np.asarray(bp.xl, np.float64), np.asarray(bp.xu, np.float64),
        stat_tol=5e-4, feas_tol=5e-4,
    )
    assert orc["ok"], orc


def test_blocked_hard_numpy_baseline_matches_framework():
    """The matrix-free single-core baseline certifies the same instance to
    f64 KKT grade and lands on the framework's solution."""
    import numpy as np

    from benlsip_tpu.baselines.numpy_ref import solve_blocked_numpy
    from benlsip_tpu.dist.mesh import make_mesh
    from benlsip_tpu.dist.sharded import solve_large_blocked_family
    from benlsip_tpu.problems.generators import blocked_hard_family
    from benlsip_tpu.solver.options import SolverOptions

    bp, theta, x0 = blocked_hard_family(n=128, d=512, seed=1, dtype=jnp.float32)
    mesh = make_mesh(batch=1, block=1, devices=jax.devices()[:1])
    x, _, info = solve_large_blocked_family(
        bp, theta, x0, SolverOptions(max_outer_iter=20, max_inner_iter=60), mesh
    )
    xb, st = solve_blocked_numpy(
        np.asarray(theta["J"], np.float64), np.asarray(theta["y"], np.float64),
        np.asarray(bp.A, np.float64), np.asarray(bp.b, np.float64),
        np.asarray(bp.xl, np.float64), np.asarray(bp.xu, np.float64),
        np.asarray(x0, np.float64), alpha=1.5,
    )
    assert st["converged"], st
    assert st["pix"] <= 1.5e-8
    # f32 framework vs f64 baseline: agreement at f32 grade.
    assert np.max(np.abs(xb - np.asarray(x, np.float64))) < 5e-3
