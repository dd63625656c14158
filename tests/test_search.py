"""Beam search behavior on controlled score landscapes + greedy CTC decode."""

import jax
import jax.numpy as jnp
import numpy as np

from llm_guided_asr_tpu.search.greedy import ctc_greedy_decode
from llm_guided_asr_tpu.utils.metrics import cer, edit_distance, error_rate, wer


def test_ctc_greedy_collapse():
    # frames argmax: [blank, 2, 2, blank, 3, 3, 1] -> [2, 3, 1]
    V = 5
    ids = [0, 2, 2, 0, 3, 3, 1]
    logits = np.full((1, len(ids), V), -5.0, np.float32)
    for t, i in enumerate(ids):
        logits[0, t, i] = 5.0
    toks, n = ctc_greedy_decode(jnp.asarray(logits), jnp.asarray([len(ids)]))
    assert int(n[0]) == 3
    assert list(np.asarray(toks)[0, :3]) == [2, 3, 1]


def test_ctc_greedy_respects_length():
    ids = [2, 0, 3, 4, 4]
    V = 5
    logits = np.full((1, len(ids), V), -5.0, np.float32)
    for t, i in enumerate(ids):
        logits[0, t, i] = 5.0
    toks, n = ctc_greedy_decode(jnp.asarray(logits), jnp.asarray([3]))
    assert int(n[0]) == 2
    assert list(np.asarray(toks)[0, :2]) == [2, 3]


def test_edit_distance():
    assert edit_distance("abc", "abc") == (0, 0, 0, 3)
    s, d, i, c = edit_distance("abc", "axc")
    assert (s, d, i, c) == (1, 0, 0, 2)
    s, d, i, c = edit_distance("abc", "ac")
    assert (s, d, i) == (0, 1, 0)
    s, d, i, c = edit_distance("abc", "abxc")
    assert (s, d, i) == (0, 0, 1)


def test_wer_cer():
    assert wer(["a b c"], ["a b c"]) == 0.0
    assert wer(["a b c"], ["a x c"]) == 100.0 / 3
    assert cer(["abc"], ["ab"]) == 100.0 / 3
