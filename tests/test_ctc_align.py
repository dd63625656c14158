"""CTC forced alignment: recovers known segment boundaries."""

import jax.numpy as jnp
import numpy as np

from llm_guided_asr_tpu.ops.ctc_align import ctc_forced_align, token_boundaries


def test_align_recovers_segments():
    # frames strongly favor: [1,1,1,blank,2,2,blank,3,3,3]
    V = 5
    frame_ids = [1, 1, 1, 0, 2, 2, 0, 3, 3, 3]
    logp = np.full((len(frame_ids), V), -8.0, np.float32)
    for t, i in enumerate(frame_ids):
        logp[t, i] = -0.01
    tokens = jnp.asarray([1, 2, 3])
    states, toks = ctc_forced_align(
        jnp.asarray(logp), tokens, jnp.asarray(len(frame_ids))
    )
    toks = np.asarray(toks)
    bounds = token_boundaries(toks, 3)
    assert list(bounds[0]) == [0, 3]
    assert list(bounds[1]) == [4, 6]
    assert list(bounds[2]) == [7, 10]


def test_align_repeated_tokens_need_blank():
    # transcript (1, 1): the path must pass a blank between them
    V = 3
    frame_ids = [1, 1, 0, 1, 1]
    logp = np.full((5, V), -8.0, np.float32)
    for t, i in enumerate(frame_ids):
        logp[t, i] = -0.01
    states, toks = ctc_forced_align(jnp.asarray(logp), jnp.asarray([1, 1]), jnp.asarray(5))
    toks = np.asarray(toks)
    bounds = token_boundaries(toks, 2)
    assert bounds[0][1] <= 3 and bounds[1][0] >= 2
    assert toks[2] == -1  # the middle frame is blank


def test_align_respects_length():
    V = 3
    logp = np.full((8, V), -1.0, np.float32)
    states, toks = ctc_forced_align(jnp.asarray(logp), jnp.asarray([1]), jnp.asarray(5))
    assert np.all(np.asarray(states)[5:] == -1)
