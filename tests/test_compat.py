"""scipy-compatible least_squares wrapper (benlsip_tpu/compat.py).

Cross-checked against scipy.optimize.least_squares on the same problems:
same minimizer, scipy-shaped result attributes, active_mask semantics.
"""
import sys
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from benlsip_tpu import least_squares


def _rosenbrock(x):
    return jnp.asarray([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])


def test_unbounded_rosenbrock_matches_scipy():
    sp = pytest.importorskip("scipy.optimize")
    res = least_squares(_rosenbrock, jnp.asarray([-1.2, 1.0]))
    ref = sp.least_squares(
        lambda v: np.asarray(_rosenbrock(jnp.asarray(v))), [-1.2, 1.0]
    )
    assert res.success
    np.testing.assert_allclose(np.asarray(res.x), ref.x, atol=1e-7)
    assert res.cost < 1e-14
    np.testing.assert_allclose(np.asarray(res.active_mask), 0)
    assert res.fun.shape == (2,) and res.jac.shape == (2, 2)


def test_bounded_matches_scipy():
    """Bound binds at the solution: x1 <= 0.8 cuts the Rosenbrock valley."""
    sp = pytest.importorskip("scipy.optimize")
    bounds = ([-2.0, -2.0], [0.8, 2.0])
    res = least_squares(_rosenbrock, jnp.asarray([-1.2, 1.0]), bounds=bounds)
    ref = sp.least_squares(
        lambda v: np.asarray(_rosenbrock(jnp.asarray(v))), [-1.2, 1.0],
        bounds=bounds, xtol=1e-15, gtol=1e-12,
    )
    assert res.success
    np.testing.assert_allclose(np.asarray(res.x), ref.x, atol=1e-6)
    assert int(res.active_mask[0]) == 1  # upper bound active
    assert res.optimality < 1.5e-8


def test_args_and_explicit_jac():
    """fun(x, *args) + hand-coded jac route; linear problem, exact answer."""
    A = jnp.asarray([[2.0, 0.0], [0.0, 3.0], [1.0, 1.0]])
    b = jnp.asarray([2.0, 3.0, 2.0])
    res = least_squares(
        lambda x, M, y: M @ x - y,
        jnp.zeros(2),
        jac=lambda x, M, y: M,
        args=(A, b),
    )
    assert res.success
    expect = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)[0]
    np.testing.assert_allclose(np.asarray(res.x), expect, atol=1e-9)


def test_equality_extension_beyond_scipy():
    """A_eq/b_eq — the surface scipy cannot express: projection onto a
    line segment via NLS with a linear equality."""
    p = jnp.asarray([0.3, 0.9])
    res = least_squares(
        lambda x: x - p, jnp.zeros(2),
        A_eq=jnp.asarray([[1.0, 1.0]]), b_eq=jnp.asarray([1.0]),
    )
    assert res.success
    expect = np.asarray(p) + (1 - float(p.sum())) / 2.0
    np.testing.assert_allclose(np.asarray(res.x), expect, atol=1e-8)


def test_integer_x0_is_cast_like_scipy():
    """scipy accepts integer x0; so must the wrapper (review finding)."""
    res = least_squares(_rosenbrock, [0, 0])
    assert res.success
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-7)
    assert res.nfev >= res.nit  # scipy-present counters exist
    assert res.njev is None


def test_max_nfev_caps_both_loops():
    """max_nfev caps per-subproblem TR iterations AND subproblem count;
    the realized evaluation count is reported in nfev."""
    res = least_squares(_rosenbrock, jnp.asarray([-1.2, 1.0]), max_nfev=3)
    assert res.nfev <= 3 * 3 + 1  # product bound from the documented mapping


def test_bounds_instance_like_scipy():
    """scipy.optimize.Bounds instances are accepted alongside the 2-tuple
    form (review finding: bounds[0] raised an opaque TypeError)."""

    class Bounds:  # stand-in with scipy's attribute surface
        def __init__(self, lb, ub):
            self.lb, self.ub = lb, ub

    res = least_squares(_rosenbrock, jnp.asarray([0.5, 0.5]), bounds=Bounds(0.0, 0.8))
    assert res.success
    assert float(res.x[0]) <= 0.8 + 1e-9 and float(res.x[1]) <= 0.8 + 1e-9


def test_status_follows_scipy_sign_convention():
    """status > 0 iff success (scipy convention); 0 = iteration limit.
    Framework-native codes stay on res.info.status (review finding)."""
    ok = least_squares(_rosenbrock, jnp.asarray([-1.2, 1.0]))
    assert ok.success and ok.status > 0 and int(ok.info.status) == 1

    capped = least_squares(_rosenbrock, jnp.asarray([-1.2, 1.0]), max_nfev=1)
    if not capped.success:
        assert capped.status <= 0
        assert int(capped.info.status) in (2, 3)
