"""Device mesh + sharding utilities (DistributedOption analog).

Rebuild of espnet2/train/distributed_utils.py:12 (DistributedOption) for the
JAX single-controller model (SURVEY.md §2.10, §5.8): instead of
rank/world_size/NCCL, we resolve a ``jax.sharding.Mesh`` whose axes carry the
parallelism:

- ``data``: batch sharding (DDP/DataParallel equivalent — XLA inserts the
  gradient psum that bucket all-reduce does in torch);
- ``model``: tensor parallelism for large submodules (the frozen LLM); unused
  (size 1) for pure-ASR models.

Multi-host: ``jax.distributed.initialize`` (coordinator = MASTER_ADDR analog,
distributed_utils.py:87-111) before mesh construction; all hosts then see the
global device set.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass
class DistributedOption:
    """Mesh-shape resolution from flags/env (distributed_utils.py:29 analog)."""

    data_parallel: Optional[int] = None  # None = all devices
    model_parallel: int = 1
    coordinator: Optional[str] = None  # host:port for multi-host init
    num_processes: Optional[int] = None
    process_id: Optional[int] = None

    def init_distributed(self):
        if self.coordinator:
            jax.distributed.initialize(
                coordinator_address=self.coordinator,
                num_processes=self.num_processes,
                process_id=self.process_id,
            )

    def make_mesh(self) -> Mesh:
        return make_mesh(self.data_parallel, self.model_parallel)


def _slurm_first_host(nodelist: str) -> str:
    """First hostname of a SLURM nodelist (``foo[1-10,12],bar3`` -> ``foo1``).

    Analog of distributed_utils.py:313-321 get_master_addr, with the bracket
    range actually expanded instead of stripped."""
    head = nodelist.split(",")[0]
    if "[" in head:
        prefix, rest = head.split("[", 1)
        first = rest.rstrip("]").split(",")[0].split("-")[0]
        return prefix + first
    return head


def resolve_distributed_env() -> Optional[Dict[str, int]]:
    """Auto-resolve multi-process wiring from the environment.

    The reference resolves RANK/WORLD_SIZE/MASTER_ADDR from the launcher's
    environment (espnet2/train/distributed_utils.py:141-330: explicit flags,
    then SLURM srun variables, then torch.distributed.launch variables).
    Same contract here, mapped onto jax.distributed.initialize inputs.

    Priority: LLMASR_* (bin/launch.py) > SLURM_* (srun) > OMPI_* (mpirun) >
    RANK/WORLD_SIZE/MASTER_* (torchrun-style). Returns None when the
    environment describes a single-process run.
    """
    env = os.environ
    if "LLMASR_COORDINATOR" in env:
        return {
            "coordinator": env["LLMASR_COORDINATOR"],
            "num_processes": int(env.get("LLMASR_NUM_PROCESSES", "1")),
            "process_id": int(env.get("LLMASR_PROCESS_ID", "0")),
        }
    if "SLURM_PROCID" in env and "SLURM_NTASKS" in env:
        n = int(env["SLURM_NTASKS"])
        if n <= 1:
            return None
        nodelist = env.get("SLURM_STEP_NODELIST", env.get("SLURM_JOB_NODELIST", ""))
        if not nodelist:
            return None
        # deterministic per-job port in the dynamic range (every rank
        # computes the same one, like the reference's --dist_master_port)
        port = env.get("MASTER_PORT") or str(
            49152 + int(env.get("SLURM_JOB_ID", "0")) % 16000
        )
        return {
            "coordinator": f"{_slurm_first_host(nodelist)}:{port}",
            "num_processes": n,
            "process_id": int(env["SLURM_PROCID"]),
        }
    if "OMPI_COMM_WORLD_RANK" in env and "OMPI_COMM_WORLD_SIZE" in env:
        n = int(env["OMPI_COMM_WORLD_SIZE"])
        if n <= 1 or "MASTER_ADDR" not in env:
            return None
        return {
            "coordinator": f"{env['MASTER_ADDR']}:{env.get('MASTER_PORT', '29500')}",
            "num_processes": n,
            "process_id": int(env["OMPI_COMM_WORLD_RANK"]),
        }
    if "RANK" in env and "WORLD_SIZE" in env and "MASTER_ADDR" in env:
        n = int(env["WORLD_SIZE"])
        if n <= 1:
            return None
        return {
            "coordinator": f"{env['MASTER_ADDR']}:{env.get('MASTER_PORT', '29500')}",
            "num_processes": n,
            "process_id": int(env["RANK"]),
        }
    return None


def make_mesh(
    data_parallel: Optional[int] = None, model_parallel: int = 1, devices=None
) -> Mesh:
    """Mesh with ('data', 'model') axes over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data_parallel is None:
        if n % model_parallel != 0:
            raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
        data_parallel = n // model_parallel
    use = data_parallel * model_parallel
    dev_array = np.asarray(devices[:use]).reshape(data_parallel, model_parallel)
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Place batch arrays with the leading dim sharded along 'data'.

    Multi-process: every process iterates the same (seeded) global batch;
    each contributes its contiguous row block via
    ``jax.make_array_from_process_local_data`` (the per-host shard of the
    reference's ``batch[rank::world_size]`` contract, abs_task.py:1823 —
    contiguous blocks here because mesh devices are ordered by process).
    """
    sh = batch_sharding(mesh)
    pc = jax.process_count()
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim >= 1:
            if pc > 1:
                b = v.shape[0]
                per = b // pc
                pi = jax.process_index()
                local = np.asarray(v)[pi * per : (pi + 1) * per]
                out[k] = jax.make_array_from_process_local_data(
                    sh, local, v.shape
                )
            else:
                out[k] = jax.device_put(v, sh)
        else:
            out[k] = v
    return out


def replicate_tree(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))
