"""Neural codec (RVQ) and SVS models."""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import optax

from llm_guided_asr_tpu.models.codec import CodecConfig, CodecModel
from llm_guided_asr_tpu.models.svs import SVSConfig, SVSModel
from llm_guided_asr_tpu.models.tts import FastSpeech2Config


def test_codec_roundtrip_learns():
    cfg = CodecConfig(channels=16, latent_dim=16, strides=(4, 4), n_quantizers=2,
                      codebook_size=32)
    model = CodecModel(cfg)
    t = np.arange(2048) / 16000
    wav = jnp.asarray((0.5 * np.sin(2 * np.pi * 300 * t)).astype(np.float32))[None]
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, wav
    )
    tx = optax.adam(2e-3)
    params = variables["params"]
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (loss, (stats, _)), g = jax.value_and_grad(
            lambda p: (lambda o=model.apply({"params": p}, wav): (o[0], (o[1], o[2])))(),
            has_aux=True,
        )(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, stats

    _, _, s0 = step(params, opt)
    for _ in range(80):
        params, opt, stats = step(params, opt)
    assert float(stats["l1"]) < float(s0["l1"]) * 0.7, (s0, stats)

    # discrete bitstream roundtrip: encode -> codes -> decode
    codes = model.apply({"params": params}, wav, method=model.encode)
    assert codes.shape[-1] == 2 and codes.dtype in (jnp.int32, jnp.int64)
    recon = model.apply({"params": params}, codes, method=model.decode_codes)
    assert recon.shape[1] >= wav.shape[1] - 16


def test_svs_forward_and_score_inference():
    cfg = SVSConfig(
        tts=FastSpeech2Config(vocab_size=20, n_mels=16, adim=16, heads=2,
                              eunits=24, elayers=1, dlayers=1),
        n_midi=64,
    )
    model = SVSModel(cfg)
    rng = np.random.default_rng(0)
    text = jnp.asarray([[3, 4, 5, -1]], jnp.int32)
    tlens = jnp.asarray([3])
    dur = jnp.asarray([[3, 2, 4, 0]], jnp.int32)
    midi = jnp.asarray([[40, 45, 47, 0]], jnp.int32)
    speech = jnp.asarray(rng.standard_normal((1, 9, 16)), jnp.float32)
    slens = jnp.asarray([9])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text, tlens, speech, slens, dur, None, midi, deterministic=True,
    )
    loss, stats, _ = model.apply(
        variables, text, tlens, speech, slens, dur, None, midi, deterministic=True
    )
    assert np.isfinite(float(loss))
    # midi conditioning matters
    loss2, _, _ = model.apply(
        variables, text, tlens, speech, slens, dur, None, midi + 10, deterministic=True
    )
    assert float(loss) != float(loss2)

    mel, mel_lens = model.apply(
        variables, text, tlens, midi, dur, t_max=16, method=model.inference
    )
    assert mel.shape == (1, 16, 16)
    assert int(mel_lens[0]) == 9
