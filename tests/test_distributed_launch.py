"""Real multi-process distributed init on one host
(test/test_distributed_launch.py analog: spawn real process groups, assert
rank/world resolution and collective correctness; no mock backend)."""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    from llm_guided_asr_tpu.parallel.mesh import DistributedOption

    opt = DistributedOption(
        coordinator={coord!r},
        num_processes=2,
        process_id=int(sys.argv[1]),
    )
    opt.init_distributed()
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == int(sys.argv[1])
    # cross-process collective: global device array sum over both processes
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    local = np.asarray([float(jax.process_index() + 1)])
    total = multihost_utils.process_allgather(local)
    assert total.shape[0] == 2 and float(total.sum()) == 3.0, total
    print(f"proc {{jax.process_index()}} OK", flush=True)
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_group_init_and_allgather(tmp_path):
    repo = str(Path(__file__).resolve().parent.parent)
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=repo, coord=coord))
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out


def test_worker_failure_propagates(tmp_path):
    """A worker that raises exits non-zero (the reference asserts clean
    non-zero-exit propagation, test_distributed_launch.py:95)."""
    script = tmp_path / "bad.py"
    script.write_text("raise RuntimeError('boom')\n")
    p = subprocess.run([sys.executable, str(script)], capture_output=True,
                       text=True)
    assert p.returncode != 0
    assert "boom" in p.stderr
