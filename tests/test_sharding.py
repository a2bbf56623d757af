"""Multi-device data-parallel dry run on a virtual CPU mesh (subprocess).

The platform must be selected before JAX initializes, so the 8-device
CPU mesh runs in a child process (the driver exercises the same path via
__graft_entry__.dryrun_multichip).
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.heavy
def test_dryrun_multichip_8_cpu_devices():
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=3000,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip ok" in proc.stdout
