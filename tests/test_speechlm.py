"""SpeechLM composition: codec units -> unit LM -> generation."""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import optax

from llm_guided_asr_tpu.models.lm import TransformerLM, TransformerLMConfig
from llm_guided_asr_tpu.models.speechlm import SpeechLM, SpeechLMConfig


def test_unit_lm_learns_periodic_stream():
    # unit stream with period-3 structure (stand-in for codec codes)
    units_np = np.tile([3, 7, 5], 12)[None, :].astype(np.int32)  # [1, 36]
    units = jnp.asarray(units_np)
    lens = jnp.asarray([36])
    cfg = SpeechLMConfig(unit_vocab_size=16)
    lm = TransformerLM(
        TransformerLMConfig(vocab_size=17, embed_unit=16, att_unit=16, head=2,
                            unit=32, layer=1, dropout_rate=0.0)
    )
    sos = 16
    x0 = jnp.concatenate([jnp.full((1, 1), sos, jnp.int32), units[:, :-1]], 1)
    variables = lm.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0, lens, deterministic=True,
    )
    tx = optax.adam(5e-3)
    params = variables["params"]
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (loss, acc), g = jax.value_and_grad(
            lambda p: SpeechLM.lm_loss_fn(lm, {"params": p}, units, lens, sos),
            has_aux=True,
        )(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss, acc

    for _ in range(120):
        params, opt, loss, acc = step(params, opt)
    assert float(acc) > 0.9, f"unit LM acc {acc}"

    # generation continues the period-3 pattern
    gen = SpeechLM.generate(lm, {"params": params}, units[:, :6], n_new=6, sos=sos)
    expect = units_np[0, 6:12]
    assert list(np.asarray(gen)[0]) == list(expect), (gen, expect)


def test_codec_tokenize_integration():
    from llm_guided_asr_tpu.models.codec import CodecConfig, CodecModel

    cfg = CodecConfig(channels=8, latent_dim=8, strides=(4, 4), n_quantizers=2,
                      codebook_size=16)
    codec = CodecModel(cfg)
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((1, 512)), jnp.float32)
    variables = codec.init({"params": jax.random.PRNGKey(0)}, wav)
    slm = SpeechLM(codec, variables)
    units = slm.tokenize(wav)
    assert units.shape == (1, 32)
    assert np.all((np.asarray(units) >= 0) & (np.asarray(units) < 16))
