"""Padding/bucketing utilities: padded residuals solve identically; bucket
assignment covers all instances; difficulty reorder round-trips."""
import numpy as np
import jax.numpy as jnp

from benlsip_tpu.batch.buckets import (
    assign_buckets,
    bucket_edges,
    difficulty_order,
    inverse_order,
    pad_residuals,
    reorder,
)
from benlsip_tpu.batch.vmap_solve import BatchedProblem, solve_batched
from benlsip_tpu.problems.generators import exp_fit_family
from benlsip_tpu.solver.options import SolverOptions


def test_padded_residuals_solve_identically():
    B, d = 8, 12
    bp, theta, X0 = exp_fit_family(B, d=d, seed=7)
    opts = SolverOptions(max_outer_iter=40, max_inner_iter=120)
    X_ref, _, i_ref = solve_batched(bp, theta, X0, opts)

    import dataclasses

    bp_pad = dataclasses.replace(bp, residuals=pad_residuals(bp.residuals, d + 9))
    X_pad, _, i_pad = solve_batched(bp_pad, theta, X0, opts)
    np.testing.assert_allclose(np.asarray(X_pad), np.asarray(X_ref), rtol=1e-9, atol=1e-11)
    np.testing.assert_array_equal(np.asarray(i_pad.converged), np.asarray(i_ref.converged))


def test_bucket_assignment_partitions():
    sizes = [3, 17, 9, 33, 12, 12, 64, 5]
    edges = bucket_edges(sizes, max_buckets=3)
    assert edges[-1] >= max(sizes)
    groups = assign_buckets(sizes, edges)
    all_idx = np.sort(np.concatenate(groups))
    np.testing.assert_array_equal(all_idx, np.arange(len(sizes)))
    for g, e in zip(groups, edges):
        assert all(sizes[i] <= e for i in g)


def test_difficulty_reorder_roundtrip():
    iters = jnp.asarray([50, 3, 20, 7])
    order = difficulty_order(iters)
    assert list(np.asarray(iters)[order]) == sorted([50, 3, 20, 7])
    tree = {"a": jnp.arange(4.0), "b": jnp.arange(8.0).reshape(4, 2)}
    fwd = reorder(tree, order)
    back = reorder(fwd, inverse_order(order))
    np.testing.assert_array_equal(np.asarray(back["a"]), np.asarray(tree["a"]))
    np.testing.assert_array_equal(np.asarray(back["b"]), np.asarray(tree["b"]))


def test_bucket_edges_pathological_distributions():
    # Heavy skew: one huge outlier among many small sizes — edges must
    # still cover the max, partition everything, and not balloon the
    # padded area (the outlier gets its own bucket; the small mass pads
    # to a small edge, not to 4096).
    sizes = [8] * 1000 + [4096]
    edges = bucket_edges(sizes, max_buckets=4)
    assert edges[-1] == 4096 and len(edges) <= 4
    groups = assign_buckets(sizes, edges)
    np.testing.assert_array_equal(
        np.sort(np.concatenate(groups)), np.arange(len(sizes))
    )
    padded_area = sum(
        e * len(g) for e, g in zip(edges, groups)
    )
    assert padded_area <= 1000 * 8 + 4096  # no small instance pads to 4096

    # Degenerate: all sizes equal -> one edge, one bucket.
    edges1 = bucket_edges([7] * 50, max_buckets=4)
    assert edges1 == [7]

    # Dense uniques exceeding max_buckets: at most max_buckets edges,
    # every size covered, edges strictly increasing.
    sizes2 = list(range(1, 100))
    edges2 = bucket_edges(sizes2, max_buckets=4)
    assert len(edges2) <= 4 and edges2[-1] >= 99
    assert edges2 == sorted(set(edges2))
    groups2 = assign_buckets(sizes2, edges2)
    np.testing.assert_array_equal(
        np.sort(np.concatenate(groups2)), np.arange(len(sizes2))
    )


def test_chunked_ragged_tail_matches_unchunked():
    from benlsip_tpu.batch.vmap_solve import solve_batched_chunked

    B = 21  # chunk=8 -> two full chunks + ragged tail of 5 (pads to 8)
    bp, theta, X0 = exp_fit_family(B, d=12, seed=9)
    opts = SolverOptions(max_outer_iter=40, max_inner_iter=120)
    X_ref, Y_ref, i_ref = solve_batched(bp, theta, X0, opts)
    X_c, Y_c, i_c = solve_batched_chunked(bp, theta, X0, opts, chunk=8)
    np.testing.assert_array_equal(np.asarray(X_c), np.asarray(X_ref))
    np.testing.assert_array_equal(
        np.asarray(i_c.converged), np.asarray(i_ref.converged)
    )
