"""Driver entry points must work under driver conditions.

``dryrun_multichip`` is the artifact the driver uses to judge multi-chip
correctness: it must self-provision a virtual n-device CPU backend even when
the calling process sees only the single tunneled TPU (the axon plugin
ignores ``JAX_PLATFORMS``, so the env var alone is not enough —
MULTICHIP_r01.json recorded exactly that failure).
"""

import os
import subprocess
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_inprocess():
    """With a provisioned backend (conftest), the impl runs directly."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)
    g.dryrun_multichip(8)


def test_dryrun_multichip_self_provisions():
    """Driver conditions: fresh process, NO XLA_FLAGS provisioning — the
    entry point must provision its own virtual devices and exit 0."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "_ANIMSNAP_MC_CHILD")}
    code = ("import __graft_entry__ as g\n"
            "g.dryrun_multichip(8)\n")
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=560)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun_multichip OK" in r.stdout
