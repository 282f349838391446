"""Standalone QP: equality-constrained and box-constrained quadratics.

`solve_qp` makes public what the reference keeps as dead code
(`solve_quadratic`, src/pcg.jl:292-317) and adds box support.  The
equality path is one jittable program (projected CG); vmap batches it.
Run: python examples/qp_solve.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))  # repo-root run

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

from benlsip_tpu import solve_qp

rng = np.random.default_rng(0)
n, m = 12, 3
M = rng.standard_normal((n, n))
Q = jnp.asarray(M @ M.T + n * np.eye(n))
c = jnp.asarray(rng.standard_normal(n))
A = jnp.asarray(rng.standard_normal((m, n)))
b = jnp.asarray(rng.standard_normal(m))

# Equality-constrained: min ½xᵀQx + cᵀx  s.t.  Ax = b.
x, nu, info = solve_qp(Q, c, A, b)
print("equality QP: converged", bool(info.converged),
      "| ‖Ax−b‖ =", float(jnp.linalg.norm(A @ x - b)),
      "| stationarity =", float(info.stationarity))

# Batched: 16 independent QPs through vmap, one compiled program.
B = 16
Qb = jnp.broadcast_to(Q, (B, n, n))
cb = jnp.asarray(rng.standard_normal((B, n)))
Xb, NUb, infob = jax.jit(jax.vmap(lambda ci: solve_qp(Q, ci, A, b)))(cb)
print("batched:", int(infob.converged.sum()), "/", B, "converged")

# Box-constrained (Cholesky lift onto the NLS solver): projection onto a box.
t = jnp.asarray(rng.standard_normal(n)) * 2.0
xb_, _, info_b = solve_qp(jnp.eye(n), -t, xl=-1.0, xu=1.0)
print("box QP (projection): max |x - clip(t)| =",
      float(jnp.max(jnp.abs(xb_ - jnp.clip(t, -1, 1)))))
