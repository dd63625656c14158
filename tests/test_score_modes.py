"""LLM log_softmax scoring mode + per-scorer score breakdown.

- llm_score_mode='log_softmax' (llama.py:240,259-262): decode_step returns
  the frozen LM's own next-token log-probs instead of guided-decoder scores.
- Hypothesis.scores carries per-scorer cumulative raw scores
  (espnet beam_search.py merge_scores:263) — VERDICT weak #7.
"""

import pytest

pytestmark = pytest.mark.slow

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from llm_guided_asr_tpu.utils.testing import make_tiny_llm_dir

sys.path.insert(0, str(Path(__file__).parent))


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from test_llm_guided import base_config

    from llm_guided_asr_tpu.tasks.asr import build_model, init_model_variables

    llm_dir = make_tiny_llm_dir(tmp_path_factory.mktemp("tiny_llm_sm") / "model")
    config = base_config(llm_dir)
    config["model_conf"] = dict(config["model_conf"], llm_score_mode="log_softmax")
    model = build_model(config)
    variables = init_model_variables(model, config, seed=0)
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((1, 4000)), jnp.float32)
    enc, enc_lens = model.apply(
        variables, speech, jnp.asarray([4000]), method=model.encode
    )
    return model, variables, enc, enc_lens


def test_log_softmax_mode_matches_llm_forward(setup):
    """decode_step scores must equal the LM run on [prompt | response] directly."""
    from llm_guided_asr_tpu.models.llm.prompt import pack_prompt
    from llm_guided_asr_tpu.search.scorers import CachedGuidedScorer

    model, variables, enc, enc_lens = setup
    cfg = model.cfg
    K, LMAX = 2, 6
    scorer = CachedGuidedScorer(model, variables)
    state = scorer.init(enc, enc_lens[0], K, LMAX)
    tokens = jnp.full((K, LMAX), cfg.sos_id, jnp.int32)
    lens = jnp.ones((K,), jnp.int32)
    logp0, state = scorer.step(enc, enc_lens[0], state, tokens, lens, jnp.asarray(0))
    assert logp0.shape == (K, cfg.vocab_size)

    # reference computation: full uncached LLM forward over the packed prompt
    hyp, hyp_lengths = model.apply(
        variables, enc, enc_lens, method=model._first_pass_hyp
    )
    resp = jnp.full((1, 1), cfg.sos_id, jnp.int32)
    ids, valid, resp_start = pack_prompt(
        cfg.prompt, hyp, hyp_lengths, resp, jnp.asarray([1], jnp.int32)
    )
    _, logits, _ = model.apply(
        variables, ids, valid, return_logits=True,
        method=lambda m, *a, **k: m.llm(*a, **k),
    )
    pos = int(resp_start[0])  # position of sos; next-token dist lives there
    want = np.asarray(jnp.log(jnp.exp(logits[0, pos]) / jnp.exp(logits[0, pos]).sum()))
    np.testing.assert_allclose(np.asarray(logp0[0]), want, atol=2e-4, rtol=1e-3)
    # both beams identical at step 0
    np.testing.assert_allclose(np.asarray(logp0[0]), np.asarray(logp0[1]), atol=1e-5)


def test_score_breakdown_populated(setup):
    """Beam search hypotheses report per-scorer cumulative scores that
    recombine (weighted) into the total."""
    from test_llm_guided import base_config

    from llm_guided_asr_tpu.search.beam_search import BatchBeamSearch
    from llm_guided_asr_tpu.search.scorers import CachedGuidedScorer

    model, variables, enc, enc_lens = setup
    bs = BatchBeamSearch(
        model, variables, vocab_size=model.cfg.vocab_size,
        sos=model.cfg.sos_id, eos=model.cfg.eos_id, beam_size=3,
        ctc_weight=0.3, penalty=0.1,
        att_scorer=CachedGuidedScorer(model, variables),
    )
    hyps = bs(enc, enc_lens, maxlenratio=-4.0, nbest=3)
    for h in hyps:
        assert set(h.scores) == {"decoder", "ctc", "length_bonus"}
        n_steps = h.scores["length_bonus"]
        # one bonus per *scored* token: retired-eos hyps scored every token
        # incl. eos; maxlen-force-finished hyps got eos appended unscored
        assert n_steps in (len(h.yseq) - 1, len(h.yseq) - 2)
        total = (
            0.7 * h.scores["decoder"]
            + 0.3 * h.scores["ctc"]
            + 0.1 * n_steps
        )
        np.testing.assert_allclose(total, h.score, rtol=1e-4, atol=1e-3)
