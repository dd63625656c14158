"""Chunk and category-balanced iteration (espnet2/iterators + samplers extras).

- ChunkIterFactory (iterators/chunk_iter_factory.py): slices long utterances
  into fixed-length training chunks (the enh/streaming regime) — chunks are
  static-shape by construction, ideal for XLA;
- category_balanced_sampler (samplers/category_balanced_sampler.py): batches
  drawing evenly across categories (speaker IDs for spk training).
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp


class ChunkIterFactory:
    """Yield fixed-length chunks cut from each utterance's arrays.

    Array fields of length >= chunk_length are sliced into consecutive chunks
    (optionally with hop < length for overlap); shorter utterances are
    skipped (iterators/chunk_iter_factory.py default behavior).
    """

    def __init__(
        self,
        dataset,
        chunk_length: int,
        batch_size: int = 8,
        chunk_hop: Optional[int] = None,
        primary: str = "speech",
        shuffle: bool = True,
        seed: int = 0,
        to_device: bool = True,
    ):
        self.dataset = dataset
        self.chunk_length = chunk_length
        self.chunk_hop = chunk_hop or chunk_length
        self.primary = primary
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.to_device = to_device

    def __call__(self, epoch: int) -> Iterator[Dict]:
        rng = np.random.default_rng(self.seed + epoch)
        chunks: List[Dict[str, np.ndarray]] = []
        for uid in self.dataset.keys:
            item = self.dataset[uid]
            arr = np.asarray(item[self.primary])
            n = arr.shape[0]
            if n < self.chunk_length:
                continue
            for start in range(0, n - self.chunk_length + 1, self.chunk_hop):
                chunk = {}
                ok = True
                for name, v in item.items():
                    v = np.asarray(v)
                    if v.ndim >= 1 and v.shape[0] == n:
                        chunk[name] = v[start : start + self.chunk_length]
                    else:
                        ok = False  # misaligned stream: skip utterance fields
                        break
                if ok:
                    chunks.append(chunk)
        order = np.arange(len(chunks))
        if self.shuffle:
            rng.shuffle(order)
        for i in range(0, len(order), self.batch_size):
            sel = [chunks[j] for j in order[i : i + self.batch_size]]
            if not sel:
                continue
            batch: Dict = {}
            for name in sel[0]:
                stacked = np.stack([c[name] for c in sel])
                batch[name] = jnp.asarray(stacked) if self.to_device else stacked
                lengths = np.full((len(sel),), self.chunk_length, np.int32)
                batch[f"{name}_lengths"] = (
                    jnp.asarray(lengths) if self.to_device else lengths
                )
            yield batch


def category_balanced_batches(
    utt2category: Dict[str, str],
    batch_size: int,
    n_per_category: int = 1,
    seed: int = 0,
) -> List[Tuple[str, ...]]:
    """Batches drawing n utterances from each of batch_size/n categories
    (category_balanced_sampler.py; spk training needs >= 2 speakers/batch)."""
    rng = np.random.default_rng(seed)
    by_cat: Dict[str, List[str]] = {}
    for uid, cat in utt2category.items():
        by_cat.setdefault(cat, []).append(uid)
    for uids in by_cat.values():
        rng.shuffle(uids)
    cats = list(by_cat)
    rng.shuffle(cats)
    n_cats = max(batch_size // n_per_category, 1)
    batches: List[Tuple[str, ...]] = []
    cursors = {c: 0 for c in cats}
    alive = set(cats)
    while alive:
        batch: List[str] = []
        picked = [c for c in cats if c in alive][:n_cats]
        if not picked:
            break
        for c in picked:
            take = by_cat[c][cursors[c] : cursors[c] + n_per_category]
            batch.extend(take)
            cursors[c] += n_per_category
            if cursors[c] >= len(by_cat[c]):
                alive.discard(c)
        if batch:
            batches.append(tuple(batch))
    return batches
