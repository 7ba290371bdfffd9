"""Driver-contract guard: __graft_entry__ must stay importable and its
multichip dryrun must self-provision devices in a DRIVER-LIKE environment.

Round-1 lesson (VERDICT.md "What's weak" #1-2): the in-process test passed
because conftest had already exported the 8-device CPU flags, masking that
the driver's clean process (axon TPU platform, 1 real chip) failed.  The
guard now runs the exact driver invocation in a subprocess with XLA_FLAGS /
JAX_PLATFORMS scrubbed.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _scrubbed_env():
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS",
                        "PYTEST_CURRENT_TEST")}
    # Keep the dryrun off the real chip even when the axon tunnel is up:
    # the contract validates sharding on host devices either way, and the
    # provisioning path must not depend on tunnel availability.
    env["PYTHONPATH"] = REPO
    return env


@pytest.mark.slow
class TestGraftEntry:
    def test_dryrun_multichip_driver_invocation(self):
        """Clean subprocess, no conftest, 8 virtual devices — exactly what
        the driver runs for MULTICHIP_r{N}.json."""
        proc = subprocess.run(
            [sys.executable, "-c",
             "from __graft_entry__ import dryrun_multichip; "
             "dryrun_multichip(8)"],
            cwd=REPO, env=_scrubbed_env(), capture_output=True, text=True,
            timeout=900)
        assert proc.returncode == 0, (proc.stdout, proc.stderr)
        assert "joint MTMM+SD step OK" in proc.stdout, proc.stdout

    def test_dryrun_multichip_in_process_two_devices(self):
        """In-process path: backend already initialized (conftest's 8-dev
        CPU mesh) with enough devices — must use them directly."""
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(2)

    def test_entry_returns_jittable(self):
        import jax

        from __graft_entry__ import entry

        fn, args = entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (8, 83)
