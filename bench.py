"""Benchmark harness: batched constrained-NLS throughput on the default
device (the TPU chip under the driver), vs a sequential per-instance CPU
loop standing in for the reference's single-core execution model.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "problems/sec", "vs_baseline": N, ...}

Workload: BASELINE config 2 — a batch of independent small NLS instances
(n=3 exponential curve fits, box bounds + a per-instance linear equality),
solved to the working dtype's sqrt(eps) KKT tolerance.  The reference
(BEnlsip.jl) publishes no numbers and Julia is not installed in this image
(BASELINE.md), so the baseline is the same solver run sequentially one
instance at a time on CPU — the reference's execution model — measured in
the same process.  Only converged instances count toward throughput.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def _time_batched(bp, theta, X0, opts, device, chunk=512):
    from benlsip_tpu.batch.vmap_solve import solve_batched_chunked

    theta_d = jax.device_put(theta, device)
    X0_d = jax.device_put(X0, device)
    # Warmup (compile)
    X, Y, info = solve_batched_chunked(bp, theta_d, X0_d, opts, chunk=chunk)
    jax.block_until_ready(X)
    t0 = time.perf_counter()
    X, Y, info = solve_batched_chunked(bp, theta_d, X0_d, opts, chunk=chunk)
    jax.block_until_ready(X)
    dt = time.perf_counter() - t0
    conv = int(jnp.sum(info.converged))
    return dt, conv


def _time_sequential_cpu(bp, theta, X0, opts, k):
    """Sequential per-instance solves on CPU (the reference's model)."""
    from benlsip_tpu.batch.vmap_solve import solve_sequential

    cpu = jax.devices("cpu")[0]
    sub = jax.tree.map(lambda a: jax.device_put(a[:k], cpu), theta)
    X0s = jax.device_put(X0[:k], cpu)
    with jax.default_device(cpu):
        # Warmup: one instance compiles the single-solve program.
        solve_sequential(bp, jax.tree.map(lambda a: a[:1], sub), X0s[:1], opts)
        t0 = time.perf_counter()
        X, Y, info = solve_sequential(bp, sub, X0s, opts)
        jax.block_until_ready(X)
        dt = time.perf_counter() - t0
    conv = int(jnp.sum(info.converged))
    return dt, conv


def main():
    from benlsip_tpu.problems.generators import exp_fit_family
    from benlsip_tpu.solver.options import SolverOptions

    dtype = jnp.float32  # native TPU dtype; f64 runs on CPU (see SKILL.md)
    B = 1024
    opts = SolverOptions(max_outer_iter=40, max_inner_iter=120)

    bp, theta, X0 = exp_fit_family(B, d=32, seed=42, dtype=dtype)
    dev = jax.devices()[0]

    dt_b, conv_b = _time_batched(bp, theta, X0, opts, dev)
    rate = conv_b / dt_b

    k = 8
    dt_s, conv_s = _time_sequential_cpu(bp, theta, X0, opts, k)
    base_rate = max(conv_s, 1) / dt_s

    print(
        json.dumps(
            {
                "metric": "batched constrained-NLS problems solved/sec (config-2 suite, f32 KKT sqrt(eps))",
                "value": round(rate, 2),
                "unit": "problems/sec",
                "vs_baseline": round(rate / base_rate, 2),
                "batch": B,
                "converged_frac": round(conv_b / B, 4),
                "batched_wall_s": round(dt_b, 3),
                "baseline": "sequential per-instance CPU loop (Julia unavailable; see BASELINE.md)",
                "baseline_rate": round(base_rate, 3),
                "device": str(dev),
            }
        )
    )


if __name__ == "__main__":
    main()
