"""Thin mesh-aware collectives wrapper.

SURVEY.md §2.5/§5 requires the communication backend as a first-class,
nameable component: JAX collectives over ICI/DCN replace the reference's
(nonexistent) MPI/NCCL layer.  The declarative sharding paths
(`dist/sharded.py`) never call these — XLA inserts collectives — but the
hand-scheduled paths (communication-avoiding CG, Pallas ring kernels) and
tests use them through this single module so the solver core stays
mesh-agnostic.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def psum(x, axis: str):
    """Sum across a mesh axis — CG inner products rᵀv, pᵀHp
    (reference scalars at `src/basic_tralcnlss.jl:723, 732, 743`)."""
    return lax.psum(x, axis)


def pmean(x, axis: str):
    return lax.pmean(x, axis)


def all_gather(x, axis: str, *, tiled: bool = True):
    """Gather shards along a mesh axis — step assembly at matvec boundaries."""
    return lax.all_gather(x, axis, tiled=tiled)


def psum_scatter(x, axis: str, *, tiled: bool = True):
    """Reduce-scatter — blockwise JᵀJ partial-product accumulation."""
    return lax.psum_scatter(x, axis, tiled=tiled)


def ppermute_ring(x, axis: str, shift: int = 1):
    """Ring shift along a mesh axis (the ring-accumulation building block)."""
    n = lax.axis_size(axis)
    perm = [(i, (i + shift) % n) for i in range(n)]
    return lax.ppermute(x, axis, perm)


def axis_index(axis: str):
    return lax.axis_index(axis)


def initialize_distributed(**kwargs) -> None:
    """Multi-host bring-up: `jax.distributed.initialize` passthrough.

    On a pod each host calls this before building the global mesh; no-op
    arguments default to the standard TPU environment discovery.
    """
    jax.distributed.initialize(**kwargs)
