"""Chunk iterator + category-balanced sampler."""

import numpy as np

from llm_guided_asr_tpu.data.iterators_extra import (
    ChunkIterFactory,
    category_balanced_batches,
)


class DictDataset:
    def __init__(self, data):
        self.data = data
        self.keys = sorted(data)

    def __getitem__(self, k):
        return self.data[k]


def test_chunk_iter_cuts_fixed_chunks():
    data = {
        "u0": {"speech": np.arange(10, dtype=np.float32)},
        "u1": {"speech": np.arange(100, 107, dtype=np.float32)},
        "u2": {"speech": np.arange(3, dtype=np.float32)},  # too short: skipped
    }
    it = ChunkIterFactory(DictDataset(data), chunk_length=4, batch_size=3,
                          shuffle=False, to_device=False)
    batches = list(it(1))
    all_chunks = np.concatenate([b["speech"] for b in batches])
    # u0 -> chunks [0:4], [4:8]; u1 -> [100:104]; u2 skipped
    assert all_chunks.shape == (3, 4)
    assert all(b["speech_lengths"].max() == 4 for b in batches)
    starts = sorted(c[0] for c in all_chunks)
    assert starts == [0.0, 4.0, 100.0]


def test_chunk_iter_overlap():
    data = {"u0": {"speech": np.arange(8, dtype=np.float32)}}
    it = ChunkIterFactory(DictDataset(data), chunk_length=4, chunk_hop=2,
                          batch_size=8, shuffle=False, to_device=False)
    chunks = np.concatenate([b["speech"] for b in it(1)])
    assert chunks.shape[0] == 3  # starts 0, 2, 4


def test_category_balanced_batches():
    utt2cat = {f"u{i}": f"spk{i % 3}" for i in range(12)}
    batches = category_balanced_batches(utt2cat, batch_size=6, n_per_category=2, seed=0)
    seen = [u for b in batches for u in b]
    assert sorted(seen) == sorted(utt2cat)  # full coverage, no dup
    for b in batches:
        cats = [utt2cat[u] for u in b]
        # each category appears at most n_per_category times per batch
        for c in set(cats):
            assert cats.count(c) <= 2
        assert len(set(cats)) >= 2 or len(batches) == 1
