"""Batch samplers (espnet2/samplers analogs) + mesh-divisible re-chunking."""

import numpy as np
import pytest

from llm_guided_asr_tpu.data.samplers import (
    build_batch_sampler,
    folded_batch_sampler,
    num_elements_batch_sampler,
    round_batches_to_world_size,
    sorted_batch_sampler,
    unsorted_batch_sampler,
)

KEYS = [f"u{i}" for i in range(23)]
LENGTHS = {k: 100 + 37 * i for i, k in enumerate(KEYS)}


def _all_keys(batches):
    return [k for b in batches for k in b]


def test_unsorted_covers_all_in_order():
    batches = unsorted_batch_sampler(KEYS, 5)
    assert _all_keys(batches) == KEYS
    assert [len(b) for b in batches] == [5, 5, 5, 5, 3]


def test_sorted_descending():
    batches = sorted_batch_sampler(KEYS, LENGTHS, 6)
    flat = _all_keys(batches)
    assert sorted(flat) == sorted(KEYS)
    ls = [LENGTHS[k] for k in flat]
    assert ls == sorted(ls, reverse=True)


def test_folded_shrinks_batches_for_long_utts():
    batches = folded_batch_sampler(KEYS, LENGTHS, batch_size=8, fold_length=300)
    assert sorted(_all_keys(batches)) == sorted(KEYS)
    # longest-first ordering means the first batch is the smallest
    assert len(batches[0]) <= len(batches[-1])


def test_numel_caps_padded_elements():
    batches = num_elements_batch_sampler(KEYS, LENGTHS, batch_bins=3000)
    assert sorted(_all_keys(batches)) == sorted(KEYS)
    for b in batches[:-1]:
        mx = max(LENGTHS[k] for k in b)
        assert len(b) * mx <= 3000 or len(b) == 1


@pytest.mark.parametrize("dp", [2, 4, 8])
def test_round_to_world_size_divisible_no_repeats(dp):
    batches = num_elements_batch_sampler(KEYS, LENGTHS, batch_bins=2500)
    rounded = round_batches_to_world_size(batches, dp)
    flat = _all_keys(rounded)
    # every batch divides evenly -> the padded safety net never fires
    assert all(len(b) % dp == 0 for b in rounded)
    # no utterance repeated
    assert len(flat) == len(set(flat))
    # drop-last semantics: at most (len % dp) utterances dropped, from the end
    assert len(flat) == (len(KEYS) // dp) * dp
    assert set(flat) <= set(KEYS)


def test_round_to_world_size_preserves_locality():
    """Sliding at batch edges only: batch contents stay contiguous runs."""
    batches = sorted_batch_sampler(KEYS, LENGTHS, 5)
    rounded = round_batches_to_world_size(batches, 4)
    assert _all_keys(rounded) == _all_keys(batches)[: len(_all_keys(rounded))]


def test_round_to_world_size_tiny_corpus_guard():
    batches = [("a", "b")]
    assert round_batches_to_world_size(batches, 8) == batches


def test_round_to_world_size_noop_for_single_device():
    batches = unsorted_batch_sampler(KEYS, 5)
    assert round_batches_to_world_size(batches, 1) == batches


def test_build_batch_sampler_dispatch_and_unknown():
    assert build_batch_sampler("unsorted", KEYS, batch_size=4)
    with pytest.raises(ValueError, match="unknown batch_type"):
        build_batch_sampler("bogus", KEYS, lengths=LENGTHS)


def test_epoch_zero_padded_repeats_through_task_plumbing():
    """End-to-end: the task's iter factory emits dp-divisible batches, so
    shard_batch_padded's repeat branch is never taken across an epoch."""
    from llm_guided_asr_tpu.tasks.asr import _mesh_data_parallel_size

    config = {"data_parallel": 4, "model_parallel": 1}
    dp = _mesh_data_parallel_size(config)
    assert dp == 4
    batches = build_batch_sampler(
        "numel", KEYS, lengths=LENGTHS, batch_bins=2500
    )
    rounded = round_batches_to_world_size(batches, dp)
    padded_repeats = 0
    for b in rounded:
        padded_repeats += (-len(b)) % dp
    assert padded_repeats == 0
