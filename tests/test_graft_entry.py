"""The driver's multi-chip gate: dryrun_multichip must self-provision.

Round-1 failure mode (MULTICHIP_r01.json): the driver calls
dryrun_multichip(8) from a process whose jax backend is already initialized
against one real TPU chip; the function must provision its own virtual
CPU mesh (subprocess re-exec) rather than asserting on jax.devices().
"""
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_dryrun_multichip_self_provisions():
    # Run from a clean child WITHOUT the conftest's CPU env so the parent
    # process initializes whatever default backend exists (single device) --
    # exactly the driver's situation.
    code = ("import jax; assert len(jax.devices()) >= 1; "
            "import __graft_entry__ as g; g.dryrun_multichip(2)")
    env = {"PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root",
           "JAX_PLATFORMS": "cpu"}  # keep the parent itself off the tunnel
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(2)" in proc.stdout
