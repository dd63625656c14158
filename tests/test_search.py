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


def test_timesync_ctc_beam_search():
    """Frame-synchronous CTC beam search (beam_search_timesync analog):
    recovers the dominant collapsed sequence and sums path probabilities
    (beats greedy on a merge-heavy table)."""
    import jax
    import jax.numpy as jnp

    from llm_guided_asr_tpu.search.timesync import CTCBeamSearchTimesync

    V = 5  # 0=blank
    # frames: 'a a _ b' dominant, with some mass spread
    probs = np.full((6, V), 0.02, np.float32)
    probs[0, 1] = 0.9
    probs[1, 1] = 0.8
    probs[2, 0] = 0.9
    probs[3, 2] = 0.7
    probs[3, 3] = 0.25  # competing token keeps the beam honest
    probs[4, 0] = 0.9
    probs[5, 0] = 0.9
    probs /= probs.sum(-1, keepdims=True)
    logp = np.log(probs)

    class Stub:
        def apply(self, variables, enc, method=None, **kw):
            return jnp.asarray(logp)[None]

        def ctc_log_softmax(self, x):  # method identity only
            pass

    stub = Stub()
    bs = CTCBeamSearchTimesync(
        stub, {}, vocab_size=V, sos=V - 1, eos=V - 1, beam_size=4,
        blank_id=0, ctc_weight=1.0, att_weight=0.0,
    )
    enc = jnp.zeros((1, 6, 3))
    hyps = bs(enc, jnp.asarray([6]), nbest=3)
    assert hyps[0].yseq == [1, 2], hyps
    # scores are proper log path-sums: best < 0 and ranked
    assert hyps[0].score < 0
    assert all(hyps[i].score >= hyps[i + 1].score for i in range(len(hyps) - 1))
    # the [1, 3] alternative should appear in the n-best
    assert any(h.yseq == [1, 3] for h in hyps)
