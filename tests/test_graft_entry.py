"""Driver contract: dryrun_multichip compiles + runs on the virtual CPU mesh."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_dryrun_multichip_8():
    import jax

    assert len(jax.devices()) >= 8
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_driver_env():
    """Reproduce the driver's exact call: fresh interpreter, container-default
    env (no conftest device provisioning), 1-visible-device worst case.

    dryrun_multichip must self-provision the 8-device virtual mesh
    (VERDICT r1 item 1; reference analog espnet2/train/distributed_utils.py:87-111).
    """
    import os
    import subprocess

    root = str(Path(__file__).resolve().parents[1])
    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    # Emulate the bench host: a backend with exactly ONE visible device,
    # initialized before dryrun_multichip is called (sitecustomize analog).
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import jax; assert len(jax.devices()) == 1, jax.devices()\n"
        "import __graft_entry__ as g; g.dryrun_multichip(8)\n" % root
    )
    # ~62 s on a quiet 1-CPU box; the margin absorbs concurrent test-tier load
    # (measured >600 s when the whole fast tier + a TPU profile co-ran).
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=root,
        capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, f"stdout={proc.stdout}\nstderr={proc.stderr}"
    assert "dryrun_multichip(8): ok" in proc.stdout, proc.stdout


def test_entry_builds():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    # don't run the full-size model on CPU; just check abstract eval traces
    import jax

    jax.eval_shape(fn, *args)
