"""Converged-instance compaction (batch/compact.py): the horizon-split
solve must be trajectory-transparent — bit-identical to the plain chunked
solve — because a vmapped while_loop freezes finished lanes with per-lane
selects regardless of where the loop is cut (SURVEY §7.3-3)."""
import jax
import jax.numpy as jnp
import numpy as np

from benlsip_tpu.batch.compact import solve_batched_compact
from benlsip_tpu.batch.vmap_solve import solve_batched_chunked
from benlsip_tpu.problems.generators import exp_fit_family
from benlsip_tpu.solver.options import SolverOptions


def _family(B, seed=3, dtype=jnp.float32):
    return exp_fit_family(B, d=32, seed=seed, dtype=dtype)


def test_compact_bitwise_parity_with_chunked():
    B = 64
    bp, theta, X0 = _family(B)
    opts = SolverOptions(max_outer_iter=40, max_inner_iter=24)
    Xc, Yc, ic = solve_batched_chunked(bp, theta, X0, opts, chunk=B)
    # A horizon low enough that real survivors exist exercises stage B.
    Xk, Yk, ik = solve_batched_compact(
        bp, theta, X0, opts, chunk=B, stage_outer=3, survivor_chunk=16
    )
    assert np.array_equal(np.asarray(Xc), np.asarray(Xk))
    assert np.array_equal(np.asarray(Yc), np.asarray(Yk))
    for f in ("converged", "status", "outer_iters", "inner_iters", "pix", "feas"):
        assert np.array_equal(
            np.asarray(getattr(ic, f)), np.asarray(getattr(ik, f))
        ), f


def test_compact_parity_across_chunk_boundaries():
    """Chunked stage A (wide chunks + ragged pow2 tail) + bucketed stage B
    still merges back losslessly."""
    B = 56  # two chunks of 24 -> 32-pad tail exercise
    bp, theta, X0 = _family(B, seed=9)
    opts = SolverOptions(max_outer_iter=40, max_inner_iter=24)
    Xc, Yc, ic = solve_batched_chunked(bp, theta, X0, opts, chunk=24)
    Xk, Yk, ik = solve_batched_compact(
        bp, theta, X0, opts, chunk=24, stage_outer=2, survivor_chunk=8
    )
    assert np.array_equal(np.asarray(Xc), np.asarray(Xk))
    assert np.array_equal(np.asarray(Yc), np.asarray(Yk))
    assert np.array_equal(np.asarray(ic.converged), np.asarray(ik.converged))


def test_compact_no_survivors_short_circuits():
    """A horizon past every instance's schedule leaves stage B empty."""
    B = 16
    bp, theta, X0 = _family(B, seed=5)
    opts = SolverOptions(max_outer_iter=40, max_inner_iter=24)
    Xc, Yc, ic = solve_batched_chunked(bp, theta, X0, opts, chunk=B)
    Xk, Yk, ik = solve_batched_compact(
        bp, theta, X0, opts, chunk=B, stage_outer=60
    )
    assert np.array_equal(np.asarray(Xc), np.asarray(Xk))
    assert np.array_equal(np.asarray(ic.converged), np.asarray(ik.converged))
