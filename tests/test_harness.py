"""Harness tests: logging schema, metrics summaries, checkpoint/resume."""
import io
import os
import re

import numpy as np
import jax
import jax.numpy as jnp

from benlsip_tpu import SolverOptions, solve
from benlsip_tpu.harness.logging import set_log_stream
from benlsip_tpu.harness.metrics import MetricsWriter, batch_summary
from benlsip_tpu.problems import sphere_regression as sr


def test_verbose_logging_schema(tmp_path):
    # The reference's always-on log (quirk 5) becomes opt-in with the same
    # schema: banner, outer-iteration tables, inner-iteration rows.
    buf = io.StringIO()
    set_log_stream(buf)
    try:
        opts = SolverOptions(max_outer_iter=100, max_inner_iter=250, verbose=True)
        x, y, info = solve(sr.make_problem(), sr.x0(), opts)
        jax.effects_barrier()
    finally:
        set_log_stream(None)
    out = buf.getvalue()
    assert "Problem dimensions" in out
    assert "Number of parameters.................:     3" in out
    assert "Number of residuals..................:     4" in out
    assert re.search(r"Outer iter \d+", out)
    # inner rows: "   k   x.xxxxxxe+xx   x.xxe..."
    assert re.search(r"^\s+\d+\s+\d\.\d{6}e[+-]\d+\s+\d\.\d{2}e", out, re.M)
    assert bool(info.converged)


def test_metrics_batch_summary(tmp_path):
    from benlsip_tpu.batch.vmap_solve import solve_batched
    from benlsip_tpu.problems.generators import sphere_family

    bp, theta, X0 = sphere_family(8, seed=1)
    X, Y, info = solve_batched(bp, theta, X0, SolverOptions(max_outer_iter=100, max_inner_iter=300))
    s = batch_summary(info)
    assert s["batch"] == 8
    assert 0.0 <= s["converged_frac"] <= 1.0
    assert s["pix"]["p100"] >= s["pix"]["p50"]

    path = tmp_path / "metrics.jsonl"
    w = MetricsWriter(str(path))
    w.write(s, phase="test")
    w.close()
    import json

    row = json.loads(path.read_text().splitlines()[0])
    assert row["phase"] == "test" and row["batch"] == 8


def test_checkpoint_resume(tmp_path):
    from benlsip_tpu.harness.checkpoint import CheckpointedSolve
    from benlsip_tpu.problems.generators import sphere_family
    from benlsip_tpu.batch.vmap_solve import solve_batched

    bp, theta, X0 = sphere_family(4, seed=2)
    opts = SolverOptions(max_outer_iter=100, max_inner_iter=300)

    # Straight-through result for comparison.
    X_ref, Y_ref, i_ref = solve_batched(bp, theta, X0, opts)

    cdir = str(tmp_path / "ckpt")
    cs = CheckpointedSolve(bp, opts, cdir, batched=True, save_every=2)
    X1, Y1, info1 = cs.run(theta, X0, max_steps=3)  # interrupted early
    assert os.path.isdir(cdir)

    cs2 = CheckpointedSolve(bp, opts, cdir, batched=True, save_every=2)
    X2, Y2, info2 = cs2.run(theta, X0)  # resumes from step 3, runs to done
    assert bool(jnp.all(info2.converged))
    np.testing.assert_allclose(np.asarray(X2), np.asarray(X_ref), rtol=1e-6, atol=1e-8)
    # Multiplier parity with the fused path: the checkpointed runner must
    # apply the same critical-exit correction y_bar = y + mu*c as
    # solve_fixed_point, else Y comes back one first-order update stale.
    np.testing.assert_allclose(np.asarray(Y2), np.asarray(Y_ref), rtol=1e-6, atol=1e-8)
