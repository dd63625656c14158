#!/usr/bin/env python3
"""Multi-process launcher (espnet2/bin/launch.py + the espnet1 distributed
launcher, espnet/distributed/pytorch_backend/launch.py:1).

Spawns N worker processes of a task CLI on this host, wiring the JAX
multi-process environment the way the reference wires RANK/WORLD_SIZE/
MASTER_ADDR for torch.distributed:

  COORDINATOR  -> --coordinator host:port (jax.distributed.initialize)
  WORLD_SIZE   -> --num_processes
  RANK         -> --process_id

Per-process logs go to <log_dir>/worker.<rank>.log; the first non-zero exit
terminates the group and is re-raised (abs_task.py:1240-1274 error-file
semantics, test_distributed_launch.py behavior).
"""

from __future__ import annotations

import logging
import os
import signal
import socket
import subprocess
import sys
import time
from pathlib import Path

logger = logging.getLogger(__name__)


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("", 0))
        return s.getsockname()[1]


def launch(
    cmd: list,
    num_processes: int = 2,
    log_dir: str = "launch_logs",
    coordinator: str = None,
    host_process_offset: int = 0,
) -> int:
    """Run `cmd` (argv list) in num_processes local workers; returns 0 on
    success, raising RuntimeError with the failing worker's tail otherwise."""
    log_path = Path(log_dir)
    log_path.mkdir(parents=True, exist_ok=True)
    coordinator = coordinator or f"127.0.0.1:{free_port()}"
    procs = []
    logs = []
    for rank in range(num_processes):
        env = dict(os.environ)
        env["LLMASR_COORDINATOR"] = coordinator
        env["LLMASR_NUM_PROCESSES"] = str(num_processes)
        env["LLMASR_PROCESS_ID"] = str(host_process_offset + rank)
        f = open(log_path / f"worker.{rank}.log", "w")
        logs.append(f)
        procs.append(subprocess.Popen(cmd, env=env, stdout=f, stderr=subprocess.STDOUT))
    try:
        while True:
            states = [p.poll() for p in procs]
            for rank, rc in enumerate(states):
                if rc is not None and rc != 0:
                    for p in procs:
                        if p.poll() is None:
                            p.send_signal(signal.SIGTERM)
                    tail = (log_path / f"worker.{rank}.log").read_text()[-2000:]
                    raise RuntimeError(
                        f"worker {rank} exited with {rc}; log tail:\n{tail}"
                    )
            if all(rc == 0 for rc in states):
                return 0
            time.sleep(0.2)
    finally:
        for f in logs:
            f.close()
        for p in procs:
            if p.poll() is None:
                p.kill()


def main(cmd=None):
    args = list(cmd if cmd is not None else sys.argv[1:])
    # split our flags from the worker command at '--'
    num, log_dir, coordinator = 2, "launch_logs", None
    while args and args[0] != "--":
        flag = args.pop(0)
        if flag == "--num_processes":
            num = int(args.pop(0))
        elif flag == "--log_dir":
            log_dir = args.pop(0)
        elif flag == "--coordinator":
            coordinator = args.pop(0)
        else:
            raise ValueError(f"unknown launch flag {flag!r} (worker cmd goes after --)")
    if args and args[0] == "--":
        args = args[1:]
    if not args:
        raise ValueError("usage: launch.py [--num_processes N] -- <worker cmd...>")
    logging.basicConfig(level=logging.INFO)
    launch(args, num_processes=num, log_dir=log_dir, coordinator=coordinator)


if __name__ == "__main__":
    main()
