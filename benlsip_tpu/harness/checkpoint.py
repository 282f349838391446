"""Checkpoint/resume for long batched sweeps (BASELINE config 5).

The reference never needs this (solves are seconds-long, SURVEY.md §5);
pod-scale 100k-instance sweeps do.  The solver carry (`OuterCarry`) is a
plain pytree, so checkpointing is: run K outer iterations per device call
(`outer_body` under jit/vmap), save the carry with orbax, resume by
feeding the restored carry back in.  Works transparently for sharded
carries (orbax handles the distributed save).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.constraints import Polyhedron
from ..solver.options import SolverOptions
from ..solver.outer import (
    OuterCarry,
    SolveInfo,
    carry_info,
    default_atol,
    outer_body,
    outer_done,
    outer_init,
)


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


class CheckpointedSolve:
    """Stepped batched solve with periodic orbax checkpoints.

    Single-instance or batched (pass `batched=True` for vmapped stepping);
    `step()` advances every unfinished instance by one outer iteration.
    """

    def __init__(
        self,
        bp,
        options: SolverOptions,
        directory: str,
        batched: bool = True,
        save_every: int = 5,
    ):
        self.bp = bp
        self.dir = os.path.abspath(directory)
        self.save_every = save_every
        self.options = options
        self.batched = batched
        self._mgr = _ocp().CheckpointManager(self.dir)

    def _build(self, theta, X0):
        n = X0.shape[-1]
        dtype = X0.dtype
        opts = self.options.resolve_tols(jnp.dtype(dtype))
        atol = default_atol(dtype)
        poly = self.bp.polyhedron(n, dtype)

        def init_one(theta_i, x0_i, poly_i):
            return outer_init(self.bp.instance_fns(theta_i), poly_i, x0_i, opts)

        def step_one(theta_i, poly_i, carry):
            fns = self.bp.instance_fns(theta_i)
            done = outer_done(carry, opts)
            nxt = outer_body(fns, poly_i, opts, atol, carry)
            # Finished instances hold their state.
            return jax.tree.map(lambda a, b: jnp.where(done, a, b), carry, nxt)

        if self.batched:
            from ..batch.vmap_solve import BatchedProblem  # noqa: F401

            base = Polyhedron(A=2, b=1, xl=1, xu=1)
            axes = Polyhedron(
                *[0 if getattr(poly, f).ndim > getattr(base, f) else None for f in Polyhedron._fields]
            )
            init = jax.jit(jax.vmap(init_one, in_axes=(0, 0, axes)))
            step = jax.jit(jax.vmap(step_one, in_axes=(0, axes, 0)))
            done_fn = jax.jit(lambda c: jnp.all(jax.vmap(lambda ci: outer_done(ci, opts))(c)))
        else:
            init = jax.jit(init_one)
            step = jax.jit(step_one)
            done_fn = jax.jit(lambda c: outer_done(c, opts))
        return opts, poly, init, step, done_fn

    def run(
        self,
        theta,
        X0,
        max_steps: Optional[int] = None,
        resume: bool = True,
    ) -> Tuple[jax.Array, jax.Array, SolveInfo]:
        """Run to completion (or max_steps), checkpointing every save_every
        outer iterations; resumes from the latest checkpoint if present."""
        ocp = _ocp()
        opts, poly, init, step, done_fn = self._build(theta, X0)

        start = 0
        latest = self._mgr.latest_step() if resume else None
        if latest is not None:
            carry0 = init(theta, X0, poly)
            restored = self._mgr.restore(
                latest, args=ocp.args.StandardRestore(jax.tree.map(lambda a: a, carry0))
            )
            carry = OuterCarry(*restored) if not isinstance(restored, OuterCarry) else restored
            start = latest
        else:
            carry = init(theta, X0, poly)

        cap = max_steps if max_steps is not None else opts.max_outer_iter + 1
        k = start
        while k < cap and not bool(done_fn(carry)):
            carry = step(theta, poly, carry)
            k += 1
            if k % self.save_every == 0:
                self._mgr.save(k, args=ocp.args.StandardSave(carry))
        self._mgr.save(k, args=ocp.args.StandardSave(carry))
        self._mgr.wait_until_finished()

        # Critical-exit multiplier correction, mirroring solve_fixed_point
        # (solver/outer.py): at a critical exit the reference skips the
        # multiplier update (ref src/basic_tralcnlss.jl:276-283), so the
        # converged estimate is y_bar = y + mu*c.  Without this a
        # checkpointed solve returns y one first-order update stale vs the
        # fused path.
        def _final_y(c):
            crit = c.critical
            return jnp.where(crit, c.y + c.mu * c.cx, c.y)

        if self.batched:
            info = jax.vmap(lambda c: carry_info(c, opts))(carry)
            y_final = jax.vmap(_final_y)(carry)
        else:
            info = carry_info(carry, opts)
            y_final = _final_y(carry)
        return carry.x, y_final, info
