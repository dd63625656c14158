"""KV-cached standard-decoder scorer == full recompute, step by step."""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_guided_asr_tpu.models.asr_model import ASRModel, ASRModelConfig
from llm_guided_asr_tpu.models.conformer import ConformerConfig
from llm_guided_asr_tpu.models.transformer_decoder import TransformerDecoderConfig
from llm_guided_asr_tpu.ops.frontend import FrontendConfig
from llm_guided_asr_tpu.search.beam_search import BatchBeamSearch
from llm_guided_asr_tpu.search.cached_decoder import CachedDecoderScorer
from llm_guided_asr_tpu.search.scorers import StatelessAttScorer


@pytest.fixture(scope="module")
def setup():
    cfg = ASRModelConfig(
        vocab_size=12,
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=20),
        normalize="utterance_mvn",
        encoder=ConformerConfig(output_size=16, attention_heads=2, linear_units=24,
                                num_blocks=1, use_cnn_module=False),
        decoder=TransformerDecoderConfig(attention_heads=2, linear_units=24,
                                         num_blocks=2, dropout_rate=0.0,
                                         positional_dropout_rate=0.0),
        ctc_weight=0.3,
    )
    model = ASRModel(cfg)
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((1, 2048)), jnp.float32)
    text = jnp.asarray([[1, 2, -1]], jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        speech, jnp.asarray([2048]), text, jnp.asarray([2]), deterministic=True,
    )
    enc, enc_lens = model.apply(variables, speech, jnp.asarray([2048]), method=model.encode)
    return model, variables, enc, enc_lens, cfg


def test_cached_decoder_matches_stateless(setup):
    model, variables, enc, enc_lens, cfg = setup
    K, LMAX = 3, 7
    cached = CachedDecoderScorer(model, variables, cfg.decoder.attention_heads,
                                 cfg.decoder.num_blocks)
    plain = StatelessAttScorer(model, variables)

    state = cached.init(enc, enc_lens[0], K, LMAX)
    sos = cfg.sos_id
    tokens = jnp.full((K, LMAX), sos, jnp.int32)
    lens = jnp.ones((K,), jnp.int32)
    chosen = [[4, 6, 7], [5, 8, 9], [4, 7, 2]]
    for step in range(3):
        logp_c, state = cached.step(enc, enc_lens[0], state, tokens, lens, jnp.asarray(step))
        logp_s, _ = plain.step(enc, enc_lens[0], {}, tokens, lens, jnp.asarray(step))
        np.testing.assert_allclose(np.asarray(logp_c), np.asarray(logp_s),
                                   atol=2e-5, rtol=1e-4, err_msg=f"step {step}")
        new = jnp.asarray([chosen[b][step] for b in range(K)], jnp.int32)
        tokens = tokens.at[:, step + 1].set(new)
        lens = lens + 1
        parent = jnp.asarray([1, 2, 0]) if step == 1 else jnp.arange(K)
        tokens = tokens[parent]
        state = cached.select(state, parent)
    logp_c, _ = cached.step(enc, enc_lens[0], state, tokens, lens, jnp.asarray(3))
    logp_s, _ = plain.step(enc, enc_lens[0], {}, tokens, lens, jnp.asarray(3))
    np.testing.assert_allclose(np.asarray(logp_c), np.asarray(logp_s), atol=2e-5, rtol=1e-4)


def test_beam_search_with_cached_decoder_matches(setup):
    model, variables, enc, enc_lens, cfg = setup
    common = dict(vocab_size=cfg.vocab_size, sos=cfg.sos_id, eos=cfg.eos_id,
                  beam_size=3, ctc_weight=0.3)
    plain = BatchBeamSearch(model, variables, **common)
    cached = BatchBeamSearch(
        model, variables,
        att_scorer=CachedDecoderScorer(model, variables, cfg.decoder.attention_heads,
                                       cfg.decoder.num_blocks),
        **common,
    )
    h_p = plain(enc, enc_lens, nbest=2)
    h_c = cached(enc, enc_lens, nbest=2)
    assert [h.yseq for h in h_c] == [h.yseq for h in h_p]
    for a, b in zip(h_c, h_p):
        np.testing.assert_allclose(a.score, b.score, rtol=1e-4, atol=1e-4)
