"""The driver's multichip dryrun, exercised in CI at 8 AND 16 devices.

The dryrun is the committed evidence that the full distributed workload
(window-partitioned consensus BA, point-sharded Schur psum, DP + ring
matching) compiles and runs on an N-device mesh with results equal to the
single-device paths (VERDICT r04 #8: the matching leg must exercise a
non-trivial, exactly-checked match distribution, at 8 and 16 devices).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_8_devices():
    import jax

    import __graft_entry__ as ge

    n = len(jax.devices())
    assert n == 8  # conftest forces an 8-device CPU topology
    ge.dryrun_multichip(n)


def test_dryrun_16_devices():
    """16-device mesh variant runs in a subprocess (device count is fixed
    at process start)."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=16"
    # the axon plugin re-registers itself over JAX_PLATFORMS; forcing the
    # CPU backend must happen via jax.config AFTER the import
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "assert len(jax.devices()) == 16, jax.devices();"
        "import __graft_entry__ as ge; ge.dryrun_multichip(16)"
    )
    p = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=600)
    assert p.returncode == 0, p.stdout[-2000:] + p.stderr[-4000:]
    assert "dryrun_multichip OK" in p.stdout
