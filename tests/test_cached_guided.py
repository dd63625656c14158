"""Cached LLM-guided scoring == uncached full recompute (step-by-step)."""

import pytest

pytestmark = pytest.mark.slow

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_guided_asr_tpu.search.scorers import CachedGuidedScorer, StatelessAttScorer
from llm_guided_asr_tpu.utils.testing import make_tiny_llm_dir

TEMPLATE = 'fix "((HYP))" -> "'


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from test_llm_guided import base_config

    from llm_guided_asr_tpu.tasks.asr import build_model, init_model_variables

    llm_dir = make_tiny_llm_dir(tmp_path_factory.mktemp("tiny_llm_c") / "model")
    config = base_config(llm_dir)
    model = build_model(config)
    variables = init_model_variables(model, config, seed=0)
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((1, 4000)), jnp.float32)
    enc, enc_lens = model.apply(
        variables, speech, jnp.asarray([4000]), method=model.encode
    )
    return model, variables, enc, enc_lens


def test_cached_equals_uncached_over_steps(setup):
    model, variables, enc, enc_lens = setup
    K, LMAX = 3, 8
    sos = model.cfg.sos_id
    cached = CachedGuidedScorer(model, variables)
    plain = StatelessAttScorer(model, variables)

    state = cached.init(enc, enc_lens[0], K, LMAX)
    tokens = jnp.full((K, LMAX), sos, jnp.int32)
    lens = jnp.ones((K,), jnp.int32)

    chosen = [[4, 6, 7], [5, 8, 9], [4, 7, 2]]  # per-step tokens for the 3 beams
    for step in range(3):
        logp_c, state = cached.step(enc, enc_lens[0], state, tokens, lens, jnp.asarray(step))
        logp_s, _ = plain.step(enc, enc_lens[0], {}, tokens, lens, jnp.asarray(step))
        np.testing.assert_allclose(
            np.asarray(logp_c), np.asarray(logp_s), atol=2e-4, rtol=1e-3,
            err_msg=f"divergence at step {step}",
        )
        # append this step's tokens and reorder beams (exercise select)
        new = jnp.asarray([chosen[b][step] for b in range(K)], jnp.int32)
        tokens = tokens.at[:, step + 1].set(new)
        lens = lens + 1
        parent = jnp.asarray([2, 0, 1]) if step == 1 else jnp.arange(K)
        tokens = tokens[parent]
        state = cached.select(state, parent)

    # scores after a permutation step must still agree
    logp_c, _ = cached.step(enc, enc_lens[0], state, tokens, lens, jnp.asarray(3))
    logp_s, _ = plain.step(enc, enc_lens[0], {}, tokens, lens, jnp.asarray(3))
    np.testing.assert_allclose(np.asarray(logp_c), np.asarray(logp_s), atol=2e-4, rtol=1e-3)


def test_beam_search_with_cached_scorer_matches_plain(setup):
    from llm_guided_asr_tpu.search.beam_search import BatchBeamSearch

    model, variables, enc, enc_lens = setup
    common = dict(
        vocab_size=model.cfg.vocab_size, sos=model.cfg.sos_id, eos=model.cfg.eos_id,
        beam_size=3, ctc_weight=0.3,
    )
    plain = BatchBeamSearch(model, variables, **common)
    cached = BatchBeamSearch(
        model, variables, att_scorer=CachedGuidedScorer(model, variables), **common
    )
    h_plain = plain(enc, enc_lens, nbest=2)
    h_cached = cached(enc, enc_lens, nbest=2)
    assert [h.yseq for h in h_cached] == [h.yseq for h in h_plain]
    for a, b in zip(h_cached, h_plain):
        np.testing.assert_allclose(a.score, b.score, rtol=1e-4, atol=1e-4)


def test_guided_batch_decode_matches_single(setup):
    """CachedGuidedScorer under the vmapped batch decode: per-utterance
    results equal the one-at-a-time decodes (prefix caches stay per-lane)."""
    import numpy as np

    from llm_guided_asr_tpu.search.beam_search import BatchBeamSearch

    model, variables, _, _ = setup
    rng = np.random.default_rng(3)
    speech = jnp.asarray(rng.standard_normal((2, 4000)), jnp.float32) * 0.1
    lengths = jnp.full((2,), 4000, jnp.int32)
    enc, enc_lens = model.apply(variables, speech, lengths, method=model.encode)
    bs = BatchBeamSearch(
        model, variables, vocab_size=model.cfg.vocab_size,
        sos=model.cfg.sos_id, eos=model.cfg.eos_id,
        beam_size=4, ctc_weight=0.3,
        att_scorer=CachedGuidedScorer(model, variables),
    )
    h0 = bs(enc[:1], enc_lens[:1], maxlenratio=-8.0)
    h1 = bs(enc[1:], enc_lens[1:], maxlenratio=-8.0)
    nb = bs.batch_decode(enc, enc_lens, maxlenratio=-8.0)
    assert nb[0][0].yseq == h0[0].yseq
    assert nb[1][0].yseq == h1[0].yseq
