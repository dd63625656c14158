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
