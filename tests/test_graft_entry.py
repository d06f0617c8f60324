"""Driver-contract tests for __graft_entry__.py.

Round-1 post-mortem (VERDICT.md weak #1): the driver calls
``dryrun_multichip(8)`` in a fresh process where only ONE device is
visible, while every in-repo test ran under conftest's 8-device CPU
backend — masking exactly the failure mode that shipped red.  These
tests run the driver's invocation in a fresh subprocess with a
single-device backend so that code path is covered.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env(n_visible_devices: int = 1) -> dict:
    """Environment mimicking the driver: fresh process, few devices."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_visible_devices}"
    ).strip()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def test_dryrun_multichip_with_single_visible_device():
    """The driver's exact call — from a backend with ONE device.

    dryrun_multichip must self-provision a virtual 8-device mesh (it
    re-execs its body in a CPU subprocess) rather than crash with
    'mesh 2x4 needs more than 1 devices' as in round 1.
    """
    # Force the platform IN-PROCESS: sitecustomize re-pins the TPU
    # plugin in every fresh interpreter, so the env var alone would make
    # this subprocess dial the relay (and hang through an outage) before
    # ever reaching the code under test.  The driver's real process runs
    # the same dryrun_multichip, whose _visible_devices probe is
    # deadline-guarded for that case.
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import __graft_entry__ as g; g.dryrun_multichip(8); "
            "print('OK8')")
    res = subprocess.run([sys.executable, "-c", code], env=_driver_env(1),
                         cwd=REPO, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr}"
    assert "OK8" in res.stdout


def test_dryrun_multichip_in_process_when_devices_suffice():
    """Under conftest's 8-device CPU backend the dry run stays in-process."""
    import __graft_entry__ as g

    g.dryrun_multichip(4)


def test_entry_compiles_single_device():
    """entry() must return a jittable fn + args the driver can compile."""
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
