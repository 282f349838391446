"""Multi-host bring-up smoke test (SURVEY.md §4: multi-host tests runnable
on CPU without a pod): two jax.distributed processes, each with 4 virtual
devices, solve a DP-sharded global batch over the 8-device mesh."""
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_two_process_dp_solve():
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "mh_worker.py")
    port = "12356"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", port],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=os.path.dirname(here),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-2000:]}"
        assert f"proc {pid}: OK" in out, out[-2000:]
