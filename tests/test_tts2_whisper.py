"""TTS2 (discrete-unit TTS) and the whisper-style encoder."""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import optax

from llm_guided_asr_tpu.models.conformer import ConformerConfig, make_encoder
from llm_guided_asr_tpu.models.transformer_decoder import TransformerDecoderConfig
from llm_guided_asr_tpu.models.tts2 import TTS2Config, TTS2Model


def test_tts2_learns_text_to_units():
    cfg = TTS2Config(
        vocab_size=10, unit_vocab_size=12, adim=16, heads=2, units=24, elayers=1,
        decoder=TransformerDecoderConfig(attention_heads=2, linear_units=24,
                                         num_blocks=1, dropout_rate=0.0),
        lsm_weight=0.0,
    )
    model = TTS2Model(cfg)
    # deterministic mapping: text token t -> units [t, t+1]
    text = jnp.asarray([[2, 5, -1], [7, -1, -1]], jnp.int32)
    tlens = jnp.asarray([2, 1])
    units = jnp.asarray([[2, 3, 5, 6], [7, 8, -1, -1]], jnp.int32)
    ulens = jnp.asarray([4, 2])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text, tlens, units, ulens, deterministic=True,
    )
    tx = optax.adam(5e-3)
    params = variables["params"]
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (loss, (stats, _)), g = jax.value_and_grad(
            lambda p: (lambda o=model.apply({"params": p}, text, tlens, units, ulens,
                                            deterministic=True): (o[0], (o[1], o[2])))(),
            has_aux=True,
        )(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, stats

    for _ in range(100):
        params, opt, stats = step(params, opt)
    assert float(stats["acc"]) > 0.9, stats

    # beam-search interface: generate units for the first text
    from llm_guided_asr_tpu.search.beam_search import BatchBeamSearch

    enc, enc_lens = model.apply({"params": params}, text[:1], tlens[:1],
                                method=model.encode)
    beam = BatchBeamSearch(model, {"params": params},
                           vocab_size=cfg.unit_vocab_size + 1,
                           sos=cfg.unit_sos, eos=cfg.unit_sos, beam_size=2,
                           ctc_weight=0.0)
    hyps = beam(enc, enc_lens, maxlenratio=-6.0)
    gen = [i for i in hyps[0].yseq if i != cfg.unit_sos]
    assert gen[:4] == [2, 3, 5, 6], hyps[0]


def test_whisper_style_encoder():
    cfg = ConformerConfig(output_size=16, attention_heads=2, linear_units=24,
                          num_blocks=1, dropout_rate=0.0, positional_dropout_rate=0.0)
    enc = make_encoder("whisper_style", cfg, name="enc")
    feats = jnp.asarray(np.random.default_rng(0).standard_normal((2, 20, 8)), jnp.float32)
    lens = jnp.asarray([20, 11])
    v = enc.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                 feats, lens, deterministic=True)
    out, olens = enc.apply(v, feats, lens, deterministic=True)
    assert out.shape == (2, 10, 16)  # x2 subsampling
    assert list(np.asarray(olens)) == [10, 6]
    assert np.all(np.asarray(out)[1, 6:] == 0.0)
