"""Subprocess worker for the sweep preemption test: runs a checkpointed
sweep (throttled so the parent's SIGKILL lands mid-sweep), never finishing
gracefully if killed — exactly a preempted pod job.  Invoked by
tests/test_sweep_ckpt.py; CLI: <dir> <B> <sweep_chunk> <throttle_s>.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import time

from benlsip_tpu.harness.sweep import CheckpointedSweep
from benlsip_tpu.problems.generators import exp_fit_family
from benlsip_tpu.solver.options import SolverOptions


def main():
    directory, B, sweep_chunk, throttle = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), float(sys.argv[4])
    )
    markers = len(sys.argv) > 5 and sys.argv[5] == "markers"
    bp, theta, X0 = exp_fit_family(B, d=32, seed=11)
    opts = SolverOptions(max_outer_iter=40, max_inner_iter=120)
    sweep = CheckpointedSweep(
        bp, opts, directory, sweep_chunk=sweep_chunk, mixed_precision=False,
        throttle_s=throttle,
    )
    # markers mode: announce each chunk's start so the parent can land its
    # SIGKILL DURING a chunk compute (the arbitrary-point preemption test),
    # not at the post-checkpoint drain.
    cb = (lambda k: print(f"CHUNK_START {k}", flush=True)) if markers else None
    X, Y, info, resumed = sweep.run(theta, X0, chunk_callback=cb)
    print(f"worker finished resumed_from={resumed}", flush=True)


if __name__ == "__main__":
    main()
