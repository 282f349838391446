"""Problem-fixture solves: Rosenbrock (config 1) and HS48."""
import numpy as np
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
