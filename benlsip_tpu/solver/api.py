"""Public solver API.

Two surfaces:

* `tralcnllss(...)` — positional-argument mirror of the reference's only
  exported symbol (`/root/reference/src/basic_tralcnlss.jl:1, 167-197`),
  returning (x, y) plus a `SolveInfo` the reference lacks.
* `solve(problem, x0, options)` — the idiomatic entry: a `Problem` bundles
  callables + constraint data; Jacobians default to `jax.jacfwd` (the
  reference declares ForwardDiff but never uses it — SURVEY.md §0 — so
  users must hand-code Jacobians there; here autodiff is the default).

Both jit the entire solve into one XLA computation.  For batches of
instances use `benlsip_tpu.batch.vmap_solve`.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.constraints import Polyhedron, is_feasible  # noqa: F401  (re-export)
from .options import SolverOptions
from .outer import SolveInfo, solve_fixed_point

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class NLSFunctions:
    """User callables of the NLS problem (static under jit).

    residuals: x ↦ r(x) ∈ ℝᵈ; nlconstraints: x ↦ c(x) ∈ ℝᵖ (p may be 0);
    jac_res / jac_nlcons: their Jacobians (d,n)/(p,n).
    """

    residuals: Callable[[Array], Array]
    nlconstraints: Callable[[Array], Array]
    jac_res: Callable[[Array], Array]
    jac_nlcons: Callable[[Array], Array]


@dataclasses.dataclass(frozen=True)
class Problem:
    """A constrained NLS instance: min ½‖r(x)‖² s.t. c(x)=0, Ax=b, xl ≤ x ≤ xu."""

    residuals: Callable[[Array], Array]
    nlconstraints: Optional[Callable[[Array], Array]] = None
    jac_res: Optional[Callable[[Array], Array]] = None
    jac_nlcons: Optional[Callable[[Array], Array]] = None
    A: Optional[Array] = None
    b: Optional[Array] = None
    xl: Optional[Array] = None
    xu: Optional[Array] = None

    def build(self, n: int, dtype) -> Tuple[NLSFunctions, Polyhedron]:
        """Normalize to (NLSFunctions, Polyhedron), filling defaults:
        autodiff Jacobians, empty constraint blocks, infinite bounds."""
        nlcons = self.nlconstraints or (lambda x: jnp.zeros((0,), x.dtype))
        fns = NLSFunctions(
            residuals=self.residuals,
            nlconstraints=nlcons,
            jac_res=self.jac_res or jax.jacfwd(self.residuals),
            jac_nlcons=self.jac_nlcons or jax.jacfwd(nlcons),
        )
        A = self.A if self.A is not None else jnp.zeros((0, n), dtype)
        b = self.b if self.b is not None else jnp.zeros((A.shape[0],), dtype)
        xl = self.xl if self.xl is not None else jnp.full((n,), -jnp.inf, dtype)
        xu = self.xu if self.xu is not None else jnp.full((n,), jnp.inf, dtype)
        poly = Polyhedron(
            A=jnp.asarray(A, dtype),
            b=jnp.asarray(b, dtype),
            xl=jnp.asarray(xl, dtype),
            xu=jnp.asarray(xu, dtype),
        )
        return fns, poly


def solve(
    problem: Problem,
    x0: Array,
    options: SolverOptions = SolverOptions(),
    jit: bool = True,
    y0: Optional[Array] = None,
) -> Tuple[Array, Array, SolveInfo]:
    """Solve a constrained NLS problem from x0; returns (x, y, info).

    `y0` warm-starts the nonlinear-constraint multipliers — continuation
    and parameter sweeps reuse the previous solve's y to skip the early
    multiplier-correction outer iterations; None (default) computes the
    reference's least-squares estimate (ref :887-902).
    """
    x0 = jnp.asarray(x0)
    fns, poly = problem.build(x0.shape[0], x0.dtype)

    if options.verbose:
        # Solver banner (ref src/misc.jl:1-45), printed host-side once.
        from ..harness.logging import print_tralcnllss_header

        opts_r = options.resolve_tols(jnp.dtype(x0.dtype))
        d = fns.residuals(x0).shape[0]
        p = fns.nlconstraints(x0).shape[0]
        print_tralcnllss_header(
            x0.shape[0], d, p, poly.A.shape[0],
            int(jnp.sum(jnp.isfinite(poly.xl))), int(jnp.sum(jnp.isfinite(poly.xu))),
            opts_r.crit_tol, opts_r.feas_tol, options.tau,
            options.eta1, options.eta2, options.gamma1, options.gamma2,
        )

    # y0=None is a valid (empty) jit pytree leaf, so one closure serves
    # both the cold and warm-start paths.
    def run(poly_, x0_, y0_):
        return solve_fixed_point(fns, poly_, x0_, options, y0_)

    run_c = jax.jit(run) if jit else run
    return run_c(poly, x0, None if y0 is None else jnp.asarray(y0))


def tralcnllss(
    x0: Array,
    residuals: Callable[[Array], Array],
    jac_res: Callable[[Array], Array],
    nlconstraints: Callable[[Array], Array],
    jac_nlcons: Callable[[Array], Array],
    A: Array,
    b: Array,
    x_l: Array,
    x_u: Array,
    **options,
) -> Tuple[Array, Array, SolveInfo]:
    """Reference-parity entry point (ref `src/basic_tralcnlss.jl:167-197`).

    Same positional order and keyword hyperparameter names as the reference;
    returns (x, y, info) — the reference returns (x, y) (ref :297).
    """
    opts = SolverOptions(**options)
    problem = Problem(
        residuals=residuals,
        nlconstraints=nlconstraints,
        jac_res=jac_res,
        jac_nlcons=jac_nlcons,
        A=A,
        b=b,
        xl=x_l,
        xu=x_u,
    )
    return solve(problem, x0, opts)
