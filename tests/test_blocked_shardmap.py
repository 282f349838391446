"""Explicit-collectives blocked mode (SURVEY.md §2.5 SP/CP row):
`solve_large_blocked_shardmap` runs the whole solver inside shard_map with
hand-placed psums from dist/collectives.py.  Pins

* numerical parity with the pjit (XLA-inserted collectives) blocked path,
* parity with the plain unsharded solve,
* that the compiled program's collectives are exactly the expected psums
  (all-reduces), nothing else.
"""
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from benlsip_tpu.batch.vmap_solve import BatchedProblem
from benlsip_tpu.dist.mesh import make_mesh
from benlsip_tpu.dist.sharded import (
    solve_large_blocked_family,
    solve_large_blocked_shardmap,
)
from benlsip_tpu.solver.options import SolverOptions

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-virtual-device CPU mesh"
)


def _family(n=96, d=512, m=4, seed=2):
    rng = np.random.default_rng(seed)
    J = jnp.asarray(rng.standard_normal((d, n)) / np.sqrt(d))
    x_true = rng.standard_normal(n)
    y = J @ jnp.asarray(x_true) + 0.01 * jnp.asarray(rng.standard_normal(d))
    A = jnp.asarray(rng.standard_normal((m, n)) / np.sqrt(n))
    theta = {"J": J, "y": y}
    bp = BatchedProblem(
        residuals=lambda x, th: th["J"] @ x - th["y"],
        jac_res=lambda x, th: th["J"],
        A=A,
        b=A @ jnp.asarray(x_true),
        xl=jnp.full(n, -3.0),
        xu=jnp.full(n, 3.0),
    )
    return bp, theta, jnp.zeros(n), n, d


def test_shardmap_blocked_matches_pjit_blocked():
    bp, theta, x0, n, d = _family()
    mesh = make_mesh(batch=1, block=8)
    opts = SolverOptions(max_outer_iter=8, max_inner_iter=40)
    x_s, y_s, i_s = solve_large_blocked_shardmap(bp, theta, x0, opts, mesh)
    x_p, y_p, i_p = solve_large_blocked_family(bp, theta, x0, opts, mesh)
    assert bool(i_s.converged) and bool(i_p.converged)
    np.testing.assert_allclose(np.asarray(x_s), np.asarray(x_p), rtol=1e-8, atol=1e-10)


def test_shardmap_blocked_collectives_are_psums_only():
    from bench_scaling import collective_stats

    from benlsip_tpu.dist.sharded import _blocked_shardmap_runner, _resolve_blocked_options
    import dataclasses

    bp, theta, x0, n, d = _family()
    mesh = make_mesh(batch=1, block=8)
    opts = dataclasses.replace(
        _resolve_blocked_options(SolverOptions(max_outer_iter=4, max_inner_iter=8)),
        spmd_axis="block",
        gram_hessian="on",
    )
    poly = bp.polyhedron(n, x0.dtype)
    fns_key = (bp.residuals, bp.nlconstraints, bp.jac_res, bp.jac_nlcons)
    runner = _blocked_shardmap_runner(fns_key, opts, mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    theta_p = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("block", *([None] * (a.ndim - 1)))))
        if a.ndim >= 1 and a.shape[0] % 8 == 0
        else jax.device_put(a, NamedSharding(mesh, P())),
        theta,
    )
    compiled = runner.lower(poly, x0, theta_p).compile()
    counts, _ = collective_stats(compiled.as_text())
    # Every hand-placed collective is a psum -> all-reduce in HLO; the
    # explicit schedule must not have smuggled in gathers/scatters.
    assert set(counts) <= {"all-reduce"}, counts
    assert counts.get("all-reduce", 0) > 0


def test_ring_psum_scatter_matches_lax():
    """dist/collectives.ring_psum_scatter ≡ lax.psum_scatter(tiled=True)."""
    from benlsip_tpu.dist.collectives import ring_psum_scatter
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(batch=1, block=8)
    rng = np.random.default_rng(0)
    # One distinct (16, 5) partial per device, sharded in as (128, 5).
    x = jnp.asarray(rng.standard_normal((8 * 16, 5)))

    def run(fn):
        return jax.jit(
            jax.shard_map(
                fn, mesh=mesh, in_specs=P("block"), out_specs=P("block"), check_vma=False
            )
        )(x)

    ring = run(lambda a: ring_psum_scatter(a, "block"))
    ref = run(lambda a: jax.lax.psum_scatter(a, "block", tiled=True))
    np.testing.assert_allclose(np.asarray(ring), np.asarray(ref), rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("schedule", ["xla", "ring"])
def test_sharded_gram_layout_matches_replicated(schedule):
    """gram_layout="sharded" (both reduce schedules) reproduces the
    replicated-Gram blocked solve and the pjit path."""
    import dataclasses

    bp, theta, x0, n, d = _family()
    mesh = make_mesh(batch=1, block=8)
    base = SolverOptions(max_outer_iter=8, max_inner_iter=40)
    opts_s = dataclasses.replace(base, gram_layout="sharded", reduce_schedule=schedule)
    x_s, y_s, i_s = solve_large_blocked_shardmap(bp, theta, x0, opts_s, mesh)
    x_r, y_r, i_r = solve_large_blocked_shardmap(bp, theta, x0, base, mesh)
    assert bool(i_s.converged) and bool(i_r.converged)
    np.testing.assert_allclose(np.asarray(x_s), np.asarray(x_r), rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_r), rtol=1e-6, atol=1e-8)


def test_sharded_gram_collective_mix():
    """The sharded-Gram program reduce-scatters the refresh and gathers the
    matvec: HLO must contain reduce-scatter + all-gather (xla schedule) or
    collective-permute (ring schedule), alongside the scalar psums."""
    from bench_scaling import collective_stats

    from benlsip_tpu.dist.sharded import _blocked_shardmap_runner, _resolve_blocked_options
    import dataclasses
    from jax.sharding import NamedSharding, PartitionSpec as P

    bp, theta, x0, n, d = _family()
    mesh = make_mesh(batch=1, block=8)

    def compile_with(schedule):
        opts = dataclasses.replace(
            _resolve_blocked_options(SolverOptions(max_outer_iter=4, max_inner_iter=8)),
            spmd_axis="block",
            gram_hessian="on",
            gram_layout="sharded",
            reduce_schedule=schedule,
        )
        poly = bp.polyhedron(n, x0.dtype)
        fns_key = (bp.residuals, bp.nlconstraints, bp.jac_res, bp.jac_nlcons)
        runner = _blocked_shardmap_runner(fns_key, opts, mesh)
        theta_p = jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P("block", *([None] * (a.ndim - 1)))))
            if a.ndim >= 1 and a.shape[0] % 8 == 0
            else jax.device_put(a, NamedSharding(mesh, P())),
            theta,
        )
        counts, _ = collective_stats(runner.lower(poly, x0, theta_p).compile().as_text())
        return counts

    xla = compile_with("xla")
    assert xla.get("reduce-scatter", 0) > 0, xla   # the Gram refresh
    assert xla.get("all-gather", 0) > 0, xla       # the per-matvec assembly

    ring = compile_with("ring")
    assert ring.get("collective-permute", 0) > 0, ring  # the D−1 ring hops
    assert ring.get("all-gather", 0) > 0, ring


def test_explicit_qr_under_spmd_axis_raises():
    """gn_factorization='qr' cannot be honored under shard_map (no
    distributed QR); it must fail loudly instead of silently running the
    Gram route the user rejected."""
    import dataclasses

    bp, theta, x0, n, d = _family()
    mesh = make_mesh(batch=1, block=8)
    opts = dataclasses.replace(
        SolverOptions(max_outer_iter=4, max_inner_iter=8), gn_factorization="qr"
    )
    with pytest.raises(ValueError, match="Householder"):
        solve_large_blocked_shardmap(bp, theta, x0, opts, mesh)


def test_shardmap_respects_explicit_gram_off():
    """An explicit gram_hessian='off' must stay matrix-free in the blocked
    shard_map mode (only 'auto' is resolved to 'on') — and still converge
    to the same solution."""
    import dataclasses

    bp, theta, x0, n, d = _family()
    mesh = make_mesh(batch=1, block=8)
    base = SolverOptions(max_outer_iter=8, max_inner_iter=40)
    opts_off = dataclasses.replace(base, gram_hessian="off")
    x_mf, y_mf, i_mf = solve_large_blocked_shardmap(bp, theta, x0, opts_off, mesh)
    x_g, y_g, i_g = solve_large_blocked_shardmap(bp, theta, x0, base, mesh)
    assert bool(i_mf.converged) and bool(i_g.converged)
    np.testing.assert_allclose(np.asarray(x_mf), np.asarray(x_g), rtol=1e-7, atol=1e-9)


def test_lazy_ring_gram_build_transient_is_chunk_sized():
    """The n>=20k memory story (VERDICT r3 #3): the lazy-ring row-sharded
    Gram build must compile with a temp arena of ~n^2/D (one travelling
    buffer + one chunk), NOT the full n^2 local partial.  Unrolled-ring
    versions measured the full n^2 (1.68 GB at n=20480) because XLA
    hoists all chunk GEMMs ahead of the first hop; the fori_loop form
    bounds it structurally (dist/collectives.ring_psum_scatter_lazy)."""
    from jax.sharding import Mesh, PartitionSpec as P

    from benlsip_tpu.ops.al import AlHessian, with_gram_rows

    n, d, D = 8192, 1024, 8
    mesh = Mesh(np.array(jax.devices()[:D]).reshape(D), ("block",))

    def refresh(J_loc):
        H = AlHessian(J_loc, jnp.zeros((0, n), jnp.float32), jnp.float32(1.0))
        return with_gram_rows(H, "block", schedule="ring").G_rows

    f = jax.jit(jax.shard_map(refresh, mesh=mesh, in_specs=P("block"),
                              out_specs=P("block"), check_vma=False))
    ma = f.lower(jax.ShapeDtypeStruct((d, n), jnp.float32)).compile().memory_analysis()
    full = n * n * 4
    # One output chunk (n^2/D) + one in-flight chunk + slack, far below n^2.
    assert ma.temp_size_in_bytes <= 3 * full // D, (
        ma.temp_size_in_bytes, full)

    # And the schedule still reduces correctly (parity with psum_scatter).
    rng = np.random.default_rng(0)
    n2, d2 = 256, 64
    Jv = jnp.asarray(rng.standard_normal((d2, n2)), jnp.float32)

    def r_of(schedule):
        def r(J_loc):
            H = AlHessian(J_loc, jnp.zeros((0, n2), jnp.float32), jnp.float32(1.0))
            return with_gram_rows(H, "block", schedule=schedule).G_rows
        return jax.jit(jax.shard_map(r, mesh=mesh, in_specs=P("block"),
                                     out_specs=P("block"), check_vma=False))

    np.testing.assert_allclose(np.asarray(r_of("ring")(Jv)),
                               np.asarray(r_of("xla")(Jv)), atol=5e-5)
