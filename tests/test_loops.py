"""run_bounded: unrolled-masked and while_loop strategies agree."""
import numpy as np
import jax.numpy as jnp

from benlsip_tpu.solver.loops import run_bounded


def collatz_steps(n0, max_trips, unroll_limit):
    def cond(c):
        return (c[0] != 1) & (c[1] < max_trips)

    def body(c):
        n, k = c
        n = jnp.where(n % 2 == 0, n // 2, 3 * n + 1)
        return (n, k + 1)

    return run_bounded(cond, body, (jnp.asarray(n0), jnp.asarray(0)), max_trips, unroll_limit)


def test_unrolled_matches_while():
    for n0 in [1, 6, 7, 27]:
        a = collatz_steps(n0, max_trips=16, unroll_limit=100)   # unrolled
        b = collatz_steps(n0, max_trips=16, unroll_limit=0)     # while_loop
        assert int(a[0]) == int(b[0]) and int(a[1]) == int(b[1])


def test_zero_trips_returns_init():
    out = collatz_steps(5, max_trips=0, unroll_limit=100)
    assert int(out[0]) == 5 and int(out[1]) == 0


def test_solver_parity_unrolled_vs_while():
    # One real solve under each strategy must produce identical results.
    # The strategy is a SolverOptions field (compiled-program identity in
    # the config contract), so two option values = two cached programs.
    import dataclasses

    from benlsip_tpu.batch.vmap_solve import solve_batched
    from benlsip_tpu.problems.generators import sphere_family
    from benlsip_tpu.solver.options import SolverOptions

    bp, theta, X0 = sphere_family(4, seed=8)
    opts = SolverOptions(max_outer_iter=60, max_inner_iter=200, unroll_limit=0)
    X_w, _, i_w = solve_batched(bp, theta, X0, opts)
    X_u, _, i_u = solve_batched(
        bp, theta, X0, dataclasses.replace(opts, unroll_limit=24)
    )
    # Not bitwise: XLA schedules the QR/Householder ops of the multiplier
    # estimate and the R-factor operator differently inside an unrolled
    # body vs a while_loop body, and the 1-ulp differences amplify by the
    # problem's conditioning through the solve.  The parity claim is
    # semantic (same solutions, same convergence flags) at solver grade.
    np.testing.assert_allclose(np.asarray(X_u), np.asarray(X_w), rtol=1e-7, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(i_u.converged), np.asarray(i_w.converged))
