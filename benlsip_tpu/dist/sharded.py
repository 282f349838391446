"""Sharded execution paths: data-parallel batched solves and the
blocked-Jacobian mode for one large instance.

DP (configs 2/5): `solve_batched_sharded` is the vmapped solver with its
batch axis laid out over the mesh — per-instance independence means XLA
partitions it with zero cross-chip traffic.

TP (config 4): `blocked_jacobian_fns` wraps a problem's callables so every
Jacobian the solver materializes is sharding-constrained to row blocks over
the 'block' axis.  The AL evaluation g = Jᵀr and the matrix-free products
Jᵀ(Jv) inside CG then partition as [row-sharded GEMV → psum] — the
ring/psum-accumulation pattern SURVEY.md §5 maps onto this domain — with
the collectives inserted by XLA's SPMD partitioner, not hand-written.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..batch.vmap_solve import BatchedProblem, solve_batched
from ..solver.api import NLSFunctions, Problem
from ..solver.options import SolverOptions
from ..solver.outer import SolveInfo, solve_fixed_point
from .mesh import batch_sharding, shard_batch

Array = jax.Array


def solve_batched_sharded(
    bp: BatchedProblem,
    theta,
    X0: Array,
    options: SolverOptions,
    mesh: Mesh,
) -> Tuple[Array, Array, SolveInfo]:
    """Data-parallel batched solve: batch axis sharded over mesh['batch'].

    The batch size must be divisible by the batch-axis size.  Inputs are
    placed sharded so the compiled computation runs SPMD without resharding.
    """
    theta = shard_batch(theta, mesh)
    X0 = jax.device_put(X0, batch_sharding(mesh, X0.ndim))
    return solve_batched(bp, theta, X0, options)


def blocked_jacobian_fns(fns: NLSFunctions, mesh: Mesh) -> NLSFunctions:
    """Constrain every Jacobian evaluation to row-block sharding.

    The residual dimension d (and constraint dimension p) shard over
    'block'; variables stay replicated.  All downstream contractions
    (Jᵀr, Jᵀ(Jv), ‖Jv‖²) become partial products + psum over ICI.
    """
    j_spec = NamedSharding(mesh, P("block", None))

    def constrain(jac):
        def wrapped(x):
            return jax.lax.with_sharding_constraint(jac(x), j_spec)

        return wrapped

    r_spec = NamedSharding(mesh, P("block"))

    def constrain_vec(fn):
        def wrapped(x):
            return jax.lax.with_sharding_constraint(fn(x), r_spec)

        return wrapped

    return NLSFunctions(
        residuals=constrain_vec(fns.residuals),
        nlconstraints=fns.nlconstraints,
        jac_res=constrain(fns.jac_res),
        jac_nlcons=fns.jac_nlcons,
    )


def solve_large_blocked(
    problem: Problem,
    x0: Array,
    options: SolverOptions,
    mesh: Mesh,
) -> Tuple[Array, Array, SolveInfo]:
    """Solve one large instance with the residual/Jacobian row-sharded
    (BASELINE config 4).  d should be divisible by mesh['block'].

    Note: arrays closed over by the problem callables become program
    literals; for data at HBM scale use `solve_large_blocked_family`, which
    threads the data through as traced (sharded) arguments.
    """
    x0 = jnp.asarray(x0)
    fns, poly = problem.build(x0.shape[0], x0.dtype)
    fns = blocked_jacobian_fns(fns, mesh)

    run = jax.jit(lambda p, x: solve_fixed_point(fns, p, x, options))
    return run(poly, x0)


def solve_large_blocked_family(
    bp,
    theta,
    x0: Array,
    options: SolverOptions,
    mesh: Mesh,
) -> Tuple[Array, Array, SolveInfo]:
    """Config-4 path with instance data as traced arguments.

    `bp` is a BatchedProblem-style family (callables take (x, theta));
    theta holds the large per-instance data (e.g. the Jacobian blocks and
    targets) and is placed row-sharded over 'block' before the call, so the
    compile payload contains no data literals (a closure-captured n≈10k
    Jacobian overflows the remote-compile transport) and the data lives
    sharded in HBM.
    """
    x0 = jnp.asarray(x0)
    n = x0.shape[0]
    poly = bp.polyhedron(n, x0.dtype)
    # Row-shard every theta leaf whose leading axis matches the residual
    # dimension structure (leaves with a d-divisible leading axis).
    block = mesh.shape["block"]

    def place(a):
        if a.ndim >= 1 and a.shape[0] % block == 0:
            return jax.device_put(a, NamedSharding(mesh, P("block", *([None] * (a.ndim - 1)))))
        return jax.device_put(a, NamedSharding(mesh, P()))

    theta = jax.tree.map(place, theta)

    def run(poly_, x0_, theta_):
        fns = blocked_jacobian_fns(bp.instance_fns(theta_), mesh)
        return solve_fixed_point(fns, poly_, x0_, options)

    return jax.jit(run)(poly, x0, theta)
