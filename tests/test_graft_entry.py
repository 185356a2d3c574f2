"""Driver-contract tests for __graft_entry__.

Round 1's multichip check failed (MULTICHIP_r01.json rc:1) because the
CPU-platform bootstrap lived only under __main__: the driver calls
``dryrun_multichip(8)`` as a library function inside a 1-TPU-attached
process.  These tests reproduce that exact invocation in a hermetic
subprocess (no XLA_FLAGS, jax imported and initialized BEFORE the call)
so the contract cannot silently regress again.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_library_call_from_one_device_process():
    env = dict(os.environ)
    # simulate the driver host: no virtual-device flags, single device
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    code = (
        "import jax\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "dryrun_multichip OK" in proc.stdout


def test_entry_returns_jittable():
    import jax

    from __graft_entry__ import entry

    fn, args = entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered is not None
