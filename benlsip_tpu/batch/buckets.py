"""Padding and bucketing for heterogeneous instance families.

vmap demands uniform shapes per batch; real sweeps (BASELINE config 5:
100k parameter-estimation instances) have ragged residual counts and
divergent difficulty.  Two tools:

* shape padding — pad the residual dimension with zeros (zero residuals
  contribute nothing to r, J, g or the Gauss-Newton Hessian, so padded
  instances solve identically) and bucket instances into a few padded
  shapes to bound waste;
* difficulty bucketing — lockstep batches run at the speed of their
  slowest member (SURVEY.md §7.3 hard-part 3), so grouping instances by
  expected iteration count (e.g. from a cheap pilot run with small caps)
  compacts the tail into its own chunks.
"""
from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def pad_residuals(residuals: Callable, d_target: int) -> Callable:
    """Wrap residuals(x, theta) -> (d,) into a (d_target,) version padded
    with zeros.  Exact: zero rows of r/J drop out of every contraction."""

    def padded(x, theta):
        r = residuals(x, theta)
        return jnp.concatenate([r, jnp.zeros((d_target - r.shape[0],), r.dtype)])

    return padded


def bucket_edges(sizes: Sequence[int], max_buckets: int = 4) -> List[int]:
    """Pick ≤ max_buckets power-of-two-ish padded sizes covering `sizes`,
    greedily minimizing total padded area."""
    uniq = sorted(set(int(s) for s in sizes))
    if len(uniq) <= max_buckets:
        return uniq
    qs = np.linspace(0, 1, max_buckets + 1)[1:]
    edges = sorted(set(int(np.quantile(uniq, q, method="higher")) for q in qs))
    if edges[-1] < uniq[-1]:
        edges[-1] = uniq[-1]
    return edges


def assign_buckets(sizes: Sequence[int], edges: Sequence[int]) -> List[np.ndarray]:
    """Instance indices per bucket (first edge ≥ size)."""
    sizes = np.asarray(sizes)
    out = []
    prev = -1
    for e in edges:
        out.append(np.flatnonzero((sizes > prev) & (sizes <= e)))
        prev = e
    return out


def difficulty_order(inner_iters: Array) -> np.ndarray:
    """Sort order grouping similar-cost instances (cheap first).

    Feed pilot-run iteration counts (small caps) and chunk the reordered
    batch; each lockstep chunk then waits only for peers of similar cost.
    """
    return np.argsort(np.asarray(inner_iters), kind="stable")


def reorder(tree, order: np.ndarray):
    """Apply an instance permutation to a batched pytree."""
    idx = jnp.asarray(order)
    return jax.tree.map(lambda a: a[idx], tree)


def inverse_order(order: np.ndarray) -> np.ndarray:
    inv = np.empty_like(order)
    inv[order] = np.arange(order.shape[0])
    return inv


def solve_batched_sorted(
    bp,
    theta,
    X0,
    options,
    chunk: int = 128,
    pilot_outer: int = 2,
    pilot_inner: int = 8,
):
    """Chunked batched solve with difficulty-sorted instance order.

    A capped pilot run ranks instances by consumed TR iterations; the real
    solve then runs difficulty-ordered chunks, so each lockstep chunk waits
    only for peers of similar cost (total ≈ the integral of the sorted
    difficulty profile instead of n_chunks × global max).  Results are
    returned in the original instance order.
    """
    import dataclasses

    from .vmap_solve import solve_batched_chunked

    pilot_opts = dataclasses.replace(
        options, max_outer_iter=pilot_outer, max_inner_iter=pilot_inner
    )
    _, _, pilot_info = solve_batched_chunked(bp, theta, X0, pilot_opts, chunk=max(chunk, 512))
    # Rank by pilot cost; instances that already converged in the pilot sort
    # first (their real solve is equally short).
    cost = np.asarray(pilot_info.inner_iters) + 1000 * (~np.asarray(pilot_info.converged))
    order = np.argsort(cost, kind="stable")

    theta_s = reorder(theta, order)
    X0_s = jnp.asarray(X0)[jnp.asarray(order)]
    # Reorder per-instance constraint data too.
    base = {"A": 2, "b": 1, "xl": 1, "xu": 1}
    upd = {
        f: getattr(bp, f)[jnp.asarray(order)]
        for f in base
        if getattr(bp, f) is not None and getattr(bp, f).ndim > base[f]
    }
    bp_s = dataclasses.replace(bp, **upd) if upd else bp

    X, Y, info = solve_batched_chunked(bp_s, theta_s, X0_s, options, chunk=chunk)
    inv = jnp.asarray(inverse_order(order))
    return jax.tree.map(lambda a: a[inv] if a.ndim >= 1 and a.shape[0] == X0_s.shape[0] else a, (X, Y, info))
