"""Per-shard loop exit for DP (VERDICT round 1 item 7).

The pjit DP program's while_loop predicate is an any-reduce over the whole
batch -> a scalar pred all-reduce across the mesh every solver iteration.
`solve_batched_shardmap` runs each shard's loop locally; these tests pin

* result parity with the single-device batched solve, and
* ZERO collectives of any kind in the compiled HLO — nothing for an
  iteration to wait on cross-mesh, per-shard exit by construction.
"""
import sys
from pathlib import Path

import numpy as np
import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from benlsip_tpu.batch.vmap_solve import solve_batched
from benlsip_tpu.dist.mesh import make_mesh
from benlsip_tpu.dist.sharded import solve_batched_shardmap
from benlsip_tpu.problems.generators import exp_fit_family
from benlsip_tpu.solver.options import SolverOptions

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-virtual-device CPU mesh"
)


def _workload(B=16):
    bp, theta, X0 = exp_fit_family(B, d=16, seed=3)
    opts = SolverOptions(max_outer_iter=30, max_inner_iter=80)
    return bp, theta, X0, opts


def test_shardmap_matches_single_device():
    bp, theta, X0, opts = _workload()
    mesh = make_mesh(batch=8)
    X_s, Y_s, info_s = solve_batched_shardmap(bp, theta, X0, opts, mesh)
    X_r, Y_r, info_r = solve_batched(bp, theta, X0, opts)
    # Instances are independent; per-shard loops change nothing numerically.
    np.testing.assert_allclose(np.asarray(X_s), np.asarray(X_r), rtol=1e-12, atol=1e-12)
    np.testing.assert_array_equal(
        np.asarray(info_s.converged), np.asarray(info_r.converged)
    )
    assert bool(np.all(np.asarray(info_s.converged)))


def test_shardmap_program_has_zero_collectives():
    from bench_scaling import collective_stats

    bp, theta, X0, opts = _workload()
    mesh = make_mesh(batch=8)
    # Lower/compile without running: grab the wrapped jit from the module
    # by compiling via AOT on sharded abstract inputs.
    import benlsip_tpu.dist.sharded as sh

    # Reuse the public entry once to build + execute, then inspect the
    # compiled text of the last executable via jit lowering again.
    from benlsip_tpu.batch.vmap_solve import _batched_runner, poly_batch_axes
    from benlsip_tpu.ops.constraints import Polyhedron
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = X0.shape[-1]
    poly = bp.polyhedron(n, X0.dtype)
    poly_axes = poly_batch_axes(poly)
    fns_key = (bp.residuals, bp.nlconstraints, bp.jac_res, bp.jac_nlcons)
    local = _batched_runner(fns_key, opts, poly_axes, jit=False)
    fn = jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(
                jax.tree.map(lambda _: P("batch"), theta),
                P("batch", None),
                Polyhedron(*(P("batch") if ax == 0 else P() for ax in poly_axes)),
            ),
            out_specs=jax.tree.map(
                lambda _: P("batch"), jax.eval_shape(local, theta, X0, poly)
            ),
            check_vma=False,
        )
    )
    lowered = fn.lower(theta, X0, poly)
    compiled = lowered.compile()
    counts, nbytes = collective_stats(compiled.as_text())
    assert counts == {}, counts
    assert nbytes == 0
