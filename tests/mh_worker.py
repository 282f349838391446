"""Worker for the multi-host smoke test (launched by test_multihost.py).

Each process owns 4 virtual CPU devices; the 2-process global mesh has 8.
Runs the DP-sharded batched solve over the global batch axis — the
config-5 execution shape (batch axis spanning hosts/DCN) at toy scale.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nprocs, process_id=pid
)

import numpy as np
import jax.numpy as jnp

from benlsip_tpu.batch.vmap_solve import solve_batched
from benlsip_tpu.dist.mesh import batch_sharding, make_mesh
from benlsip_tpu.problems.generators import sphere_family
from benlsip_tpu.solver.options import SolverOptions

assert jax.device_count() == 8 and jax.local_device_count() == 4

B = 32
bp, theta, X0 = sphere_family(B, seed=19)
mesh = make_mesh(batch=8, block=1)


def globalize(a):
    sh = batch_sharding(mesh, a.ndim)
    return jax.make_array_from_callback(a.shape, sh, lambda idx: np.asarray(a)[idx])


theta_g = jax.tree.map(globalize, theta)
X0_g = globalize(X0)

X, Y, info = solve_batched(bp, theta_g, X0_g, SolverOptions(max_outer_iter=100, max_inner_iter=300))
local_conv = np.concatenate(
    [np.atleast_1d(s.data) for s in info.converged.addressable_shards]
)
print(f"proc {pid}: local_converged={int(local_conv.sum())}/{local_conv.size}", flush=True)
assert local_conv.all(), "unconverged instances on this host"
print(f"proc {pid}: OK", flush=True)
