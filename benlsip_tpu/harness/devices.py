"""Device lookup helpers.

`jax.devices("cpu")[0]` returns the first CPU device of the GLOBAL device
list — under `jax.distributed` that device belongs to process 0 and is
non-addressable from every other process ("Cannot copy array to
non-addressable device"), which broke the mixed-precision pipeline's host
phases in multi-host runs.  Every host-placement site goes through
`local_cpu()` instead.
"""
from __future__ import annotations

import jax


def local_cpu() -> jax.Device:
    """This process's own CPU device (multi-process safe)."""
    return jax.local_devices(backend="cpu")[0]
