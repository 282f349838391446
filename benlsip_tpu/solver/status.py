"""Integer status codes for the jitted state machines.

The reference uses a Julia `@enum CG_status solved bound_hit
negative_curvature max_iter_reached` (`/root/reference/src/basic_tralcnlss.jl:12`)
with a latent bug: the status `if` at ref :753-761 can fall through and
return `nothing` (SURVEY.md §2.3 quirk 4).  Here statuses are plain int32
codes carried in loop state — every exit path maps to a code.
"""
from __future__ import annotations

import jax.numpy as jnp

# Projected-CG termination statuses (ref `src/basic_tralcnlss.jl:12`).
CG_RUNNING = jnp.int32(0)
CG_SOLVED = jnp.int32(1)             # |rᵀv| < kappa2·‖v0‖  (ref :747)
CG_BOUND_HIT = jnp.int32(2)          # step to boundary  (ref :735-737)
CG_NEGATIVE_CURVATURE = jnp.int32(3) # pᵀHp ≤ atol  (ref :725-730)
CG_MAX_ITER = jnp.int32(4)           # iteration cap (fixes quirk 4)

# Overall solve statuses (new; the reference only returns (x, y)).
SOLVE_RUNNING = jnp.int32(0)
SOLVE_CONVERGED = jnp.int32(1)       # pix ≤ crit_tol and ‖c‖ ≤ feas_tol (ref :276)
SOLVE_MAX_OUTER = jnp.int32(2)       # outer-iteration cap hit (ref :246)
SOLVE_STALLED = jnp.int32(3)         # pi stopped improving at its numerical
                                     # floor with feasibility already at
                                     # tolerance (see SolverOptions stall_*)
