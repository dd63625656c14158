"""Epoch-seeded batch iterator factory.

Rebuild of espnet2/iterators/sequence_iter_factory.py: deterministic
per-epoch shuffling of a fixed batch list, optional num_iters_per_epoch
windowing, per-rank sharding (batches[rank::world_size], abs_task.py:1823).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp


class SequenceIterFactory:
    def __init__(
        self,
        dataset,
        batches: Sequence[Tuple[str, ...]],
        collate_fn,
        shuffle: bool = True,
        seed: int = 0,
        num_iters_per_epoch: Optional[int] = None,
        rank: int = 0,
        world_size: int = 1,
        to_device: bool = True,
    ):
        self.dataset = dataset
        self.batches = list(batches)
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.seed = seed
        self.num_iters_per_epoch = num_iters_per_epoch
        self.rank = rank
        self.world_size = world_size
        self.to_device = to_device

    def __call__(self, epoch: int) -> Iterator[Dict]:
        return self.build_iter(epoch)

    def build_iter(self, epoch: int) -> Iterator[Dict]:
        order = list(range(len(self.batches)))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + epoch)
            rng.shuffle(order)
        if self.num_iters_per_epoch is not None:
            # rotate deterministically so successive epochs cover all batches
            n = self.num_iters_per_epoch
            start = (epoch - 1) * n % max(len(order), 1)
            order = (order * (n // max(len(order), 1) + 2))[start : start + n]
        order = order[self.rank :: self.world_size] if self.world_size > 1 else order
        for bi in order:
            uids = self.batches[bi]
            items = [(u, self.dataset[u]) for u in uids]
            batch = self.collate_fn(items)
            yield self._finalize(batch)

    def _finalize(self, batch: Dict) -> Dict:
        if not self.to_device:
            return batch
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray):
                out[k] = jnp.asarray(v)
            else:
                out[k] = v
        return out
