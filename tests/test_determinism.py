"""Determinism checks (SURVEY.md §5: the race-detection analog for a
single-program SPMD solver): identical inputs → bitwise-identical outputs
across runs of the same compiled program."""
import numpy as np
import jax.numpy as jnp

from benlsip_tpu.batch.vmap_solve import solve_batched
from benlsip_tpu.problems.generators import exp_fit_family, sphere_family
from benlsip_tpu.solver.options import SolverOptions


def test_batched_solve_bitwise_reproducible():
    bp, theta, X0 = sphere_family(16, seed=4)
    opts = SolverOptions(max_outer_iter=60, max_inner_iter=200)
    X1, Y1, i1 = solve_batched(bp, theta, X0, opts)
    X2, Y2, i2 = solve_batched(bp, theta, X0, opts)
    np.testing.assert_array_equal(np.asarray(X1), np.asarray(X2))
    np.testing.assert_array_equal(np.asarray(Y1), np.asarray(Y2))
    np.testing.assert_array_equal(np.asarray(i1.inner_iters), np.asarray(i2.inner_iters))


def test_f32_reproducible():
    bp, theta, X0 = exp_fit_family(32, d=16, seed=5, dtype=jnp.float32)
    opts = SolverOptions(max_outer_iter=40, max_inner_iter=120)
    X1, _, _ = solve_batched(bp, theta, X0, opts)
    X2, _, _ = solve_batched(bp, theta, X0, opts)
    np.testing.assert_array_equal(np.asarray(X1), np.asarray(X2))
