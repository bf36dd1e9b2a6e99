"""Regression tests for the driver entry points (``__graft_entry__.py``).

Round-1 failure mode (MULTICHIP_r01.json): ``dryrun_multichip`` relied on a
``"jax" not in sys.modules`` guard to set XLA_FLAGS, but the axon site hook
imports jax at interpreter start, so the guard never fired and the dryrun ran
with one device on the default (possibly broken) backend. These tests pin the
fixed bootstrap: the dryrun must force >= n virtual CPU devices no matter how
the process was initialized.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_inprocess():
    """dryrun_multichip(8) completes under the test platform (8 CPU devs)."""
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_recovers_from_initialized_backend():
    """The clear_backends recovery path: a child process initializes the CPU
    backend with ONE device (no XLA_FLAGS), then calls dryrun_multichip(8) —
    the bootstrap must tear down the stale backend and rebuild with 8."""
    env = dict(os.environ)
    # Append, never overwrite, PYTHONPATH (CLAUDE.md: overwriting kills the
    # axon site hook registration in TPU runs; harmless-but-consistent here).
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"  # keep the child off the real TPU
    env.pop("XLA_FLAGS", None)
    code = (
        "import jax\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ok, mesh=data:4 x model:2" in out.stdout, out.stdout
