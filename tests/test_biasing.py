"""Per-utterance contextual biasing through the ((BIAS)) template slot."""

import pytest

pytestmark = pytest.mark.slow

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_guided_asr_tpu.utils.testing import make_tiny_llm_dir

BIAS_TEMPLATE = 'words: ((BIAS)) fix "((HYP))" -> "'


@pytest.fixture(scope="module")
def llm_dir(tmp_path_factory):
    return make_tiny_llm_dir(tmp_path_factory.mktemp("tiny_llm_b") / "model")


def test_split_template_with_bias(llm_dir):
    from transformers import AutoConfig, AutoTokenizer

    from llm_guided_asr_tpu.models.llm.prompt import split_template

    tok = AutoTokenizer.from_pretrained(llm_dir)
    hf = AutoConfig.from_pretrained(llm_dir)
    t = split_template(tok, BIAS_TEMPLATE, hf.bos_token_id, hf.eos_token_id, "<pad>")
    assert t.has_bias_slot
    assert "".join(tok.convert_ids_to_tokens(list(t.prefix_ids[1:]))) == "words: "
    assert "".join(tok.convert_ids_to_tokens(list(t.mid_ids))) == ' fix "'
    assert "".join(tok.convert_ids_to_tokens(list(t.suffix_ids))) == '" -> "'


def test_pack_with_bias_segment():
    from llm_guided_asr_tpu.models.llm.prompt import PromptTemplate, pack_prompt

    t = PromptTemplate(
        prefix_ids=(9,), suffix_ids=(7,), start_of_response_id=5,
        end_of_response_id=5, pad_id=0, mid_ids=(8,),
    )
    bias = jnp.asarray([[31, 32, 0]])
    bias_lens = jnp.asarray([2])
    hyp = jnp.asarray([[11, 0]])
    hyp_lens = jnp.asarray([1])
    resp = jnp.asarray([[5, 21]])
    resp_lens = jnp.asarray([2])
    ids, valid, start = pack_prompt(t, hyp, hyp_lens, resp, resp_lens, bias, bias_lens)
    row = [int(x) for x, m in zip(np.asarray(ids)[0], np.asarray(valid)[0]) if m]
    assert row == [9, 31, 32, 8, 11, 7, 5, 21]
    assert int(start[0]) == 6


def test_bias_changes_guided_scores_and_cached_matches(llm_dir):
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from test_llm_guided import base_config

    from llm_guided_asr_tpu.search.scorers import CachedGuidedScorer, StatelessAttScorer
    from llm_guided_asr_tpu.tasks.asr import build_model, init_model_variables

    config = base_config(llm_dir)
    config["llm_conf"]["template_prompt"] = BIAS_TEMPLATE
    model = build_model(config)
    variables = init_model_variables(model, config, seed=0)
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((1, 4000)), jnp.float32)
    enc, enc_lens = model.apply(variables, speech, jnp.asarray([4000]), method=model.encode)

    K, LMAX = 2, 6
    sos = model.cfg.sos_id
    tokens = jnp.full((K, LMAX), sos, jnp.int32)
    lens = jnp.ones((K,), jnp.int32)
    bias = jnp.asarray([[20, 21, 22, 0]], jnp.int32)
    bias_lens = jnp.asarray([3], jnp.int32)

    cached = CachedGuidedScorer(model, variables)
    cached.set_bias(bias, bias_lens)
    st = cached.init(enc, enc_lens[0], K, LMAX)
    logp_bias, _ = cached.step(enc, enc_lens[0], st, tokens, lens, jnp.asarray(0))

    cached2 = CachedGuidedScorer(model, variables)
    st2 = cached2.init(enc, enc_lens[0], K, LMAX)
    logp_nobias, _ = cached2.step(enc, enc_lens[0], st2, tokens, lens, jnp.asarray(0))
    # biasing words must actually change the LLM conditioning
    assert not np.allclose(np.asarray(logp_bias), np.asarray(logp_nobias), atol=1e-5)

    # cached-with-bias == full recompute-with-bias
    logits = model.apply(
        variables, enc, enc_lens, tokens[:, :1], jnp.ones((K,), jnp.int32),
        method=model.decoder_logits,
        bias_words=jnp.broadcast_to(bias, (K, bias.shape[1])),
        bias_words_lengths=jnp.broadcast_to(bias_lens, (K,)),
    )
    ref = jax.nn.log_softmax(logits[:, 0].astype(jnp.float32), axis=-1)
    np.testing.assert_allclose(np.asarray(logp_bias), np.asarray(ref), atol=2e-4, rtol=1e-3)


def test_training_with_bias_words_batch(llm_dir):
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from test_llm_guided import base_config

    from llm_guided_asr_tpu.tasks.asr import build_model, init_model_variables

    config = base_config(llm_dir)
    config["llm_conf"]["template_prompt"] = BIAS_TEMPLATE
    model = build_model(config)
    variables = init_model_variables(model, config, seed=0)
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((2, 4000)), jnp.float32)
    slens = jnp.asarray([4000, 2000])
    text = jnp.asarray([[2, 3, -1], [4, -1, -1]], jnp.int32)
    tlens = jnp.asarray([2, 1])
    bias = jnp.asarray([[20, 21, -1, -1], [22, -1, -1, -1]], jnp.int32)
    blens = jnp.asarray([2, 1])
    loss, stats, _ = model.apply(
        variables, speech, slens, text, tlens, bias, blens, deterministic=True
    )
    assert np.isfinite(float(loss))
