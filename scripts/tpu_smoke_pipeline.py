"""60-second real-chip sanity check (VERDICT r4 #8): one mini
mixed-precision pipeline solve on the attached TPU, certified end-to-end.

Run via `make tpu-smoke` (with the `-m tpu` kernel tests) or directly:

    timeout 900 python scripts/tpu_smoke_pipeline.py

Exits nonzero if the chip is missing, the pipeline fails, or any
instance fails f64 KKT certification — the cheap always-on chip check
between full bench runs.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/benlsip_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def main() -> int:
    tpu = None
    for d in jax.devices():
        if "tpu" in (d.device_kind or "").lower() or d.platform == "tpu":
            tpu = d
            break
    if tpu is None:
        print("SMOKE FAIL: no TPU device attached", file=sys.stderr)
        return 2

    from benlsip_tpu.batch.refine import solve_mixed_precision
    from benlsip_tpu.problems.generators import exp_fit_family
    from benlsip_tpu.solver.options import SolverOptions

    B = 64
    bp, theta, X0 = exp_fit_family(B, d=32, seed=1, dtype=jnp.float64)
    opts = SolverOptions(max_outer_iter=40, max_inner_iter=120)
    t0 = time.perf_counter()
    # certify="device" exercises the fused on-chip certification program
    # (f32 bulk + f32 QR factors + f64 chord + exact-projection certify).
    X, Y, info = solve_mixed_precision(
        bp, theta, X0, opts, chunk=B, bulk_device=tpu, certify="device"
    )
    conv = int(jnp.sum(info.converged))
    wall = time.perf_counter() - t0
    ok = conv == B
    print(
        f"SMOKE {'OK' if ok else 'FAIL'}: {conv}/{B} certified to f64 KKT "
        f"grade in {wall:.1f}s on {tpu.device_kind} (cold caches compile "
        "~minutes through the relay; warm repeat runs are seconds)"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
