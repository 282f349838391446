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
