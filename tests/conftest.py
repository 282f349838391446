"""Test configuration: CPU backend, 8 virtual devices, float64 enabled.

Multi-chip sharding tests run on a fake 8-device CPU mesh (SURVEY.md §4),
and f64 gives parity with the reference Julia tolerances sqrt(eps(Float64))
(`/root/reference/src/basic_tralcnlss.jl:181-182`).  Env vars must be set
before jax initializes, hence this module-level block.
"""
import os

# Force-set: the image pre-sets JAX_PLATFORMS=axon,cpu (the TPU tunnel), so
# setdefault would silently leave tests running on the real chip.
# BENLSIP_TPU_TESTS=1 opts in to the chip for @pytest.mark.tpu tests
# (compiled, non-interpret Pallas smoke): `BENLSIP_TPU_TESTS=1 pytest -m tpu`.
_WANT_TPU = os.environ.get("BENLSIP_TPU_TESTS", "") == "1"
if not _WANT_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _WANT_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Loop strategy: SolverOptions.unroll_limit defaults to 0 (while_loops),
# which is also what tests want — masked-unrolled inner loops triple CPU
# compile times without exercising anything the while_loop strategy
# doesn't.  tests/test_loops.py covers strategy parity explicitly.
