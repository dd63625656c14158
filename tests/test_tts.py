"""FastSpeech2-lite TTS: length regulator, training, inference, Griffin-Lim."""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import optax

from llm_guided_asr_tpu.models.tts import (
    FastSpeech2,
    FastSpeech2Config,
    griffin_lim,
    length_regulate,
)


def test_length_regulate_exact():
    enc = jnp.asarray(np.arange(6, dtype=np.float32).reshape(1, 3, 2))
    dur = jnp.asarray([[2, 1, 3]])
    frames, lens = length_regulate(enc, dur, t_max=8)
    assert int(lens[0]) == 6
    f = np.asarray(frames)[0]
    # token 0 twice, token 1 once, token 2 three times, then zeros
    np.testing.assert_array_equal(f[0], f[1])
    np.testing.assert_array_equal(f[2], np.asarray(enc)[0, 1])
    np.testing.assert_array_equal(f[3], f[5])
    np.testing.assert_array_equal(f[6], 0.0)


def _batch(rng, B=2, L=5, T=24, M=20):
    text = jnp.asarray(rng.integers(1, 50, (B, L)), jnp.int32)
    tlens = jnp.asarray([L, L - 2])
    dur = jnp.asarray(rng.integers(2, 6, (B, L)), jnp.int32)
    dur = jnp.where(jnp.arange(L)[None] < tlens[:, None], dur, 0)
    slens = jnp.sum(dur, axis=1)
    speech = jnp.asarray(rng.standard_normal((B, T, M)), jnp.float32)
    pitch = jnp.asarray(rng.standard_normal((B, L)), jnp.float32)
    energy = jnp.asarray(rng.standard_normal((B, L)), jnp.float32)
    return text, tlens, speech, slens, dur, pitch, energy


def test_fastspeech2_train_and_infer():
    cfg = FastSpeech2Config(vocab_size=50, n_mels=20, adim=32, heads=2,
                            eunits=48, elayers=1, dlayers=1)
    model = FastSpeech2(cfg)
    rng = np.random.default_rng(0)
    text, tlens, speech, slens, dur, pitch, energy = _batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text, tlens, speech, slens, dur, None, pitch, energy, deterministic=True,
    )
    tx = optax.adam(2e-3)
    params = variables["params"]
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (loss, _), g = jax.value_and_grad(
            lambda p: model.apply({"params": p}, text, tlens, speech, slens, dur,
                                  None, pitch, energy, deterministic=True)[:2],
            has_aux=True,
        )(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    _, _, l0 = step(params, opt)
    for _ in range(40):
        params, opt, l = step(params, opt)
    assert float(l) < float(l0), "FS2 loss did not decrease"

    mel, mel_lens = model.apply(
        {"params": params}, text, tlens, t_max=64, method=model.inference
    )
    assert mel.shape == (2, 64, 20)
    assert int(mel_lens[0]) >= tlens[0]  # at least 1 frame/token
    assert np.all(np.isfinite(np.asarray(mel)))


def test_griffin_lim_reconstructs_tone():
    from llm_guided_asr_tpu.ops.frontend import stft

    t = np.arange(8000) / 16000.0
    x = jnp.asarray(0.5 * np.sin(2 * np.pi * 500 * t).astype(np.float32))[None]
    spec = stft(x, n_fft=512, hop_length=128)
    power = jnp.abs(spec) ** 2
    wav = griffin_lim(power, n_fft=512, hop_length=128, n_iters=24, length=8000)
    # reconstructed signal keeps the 500 Hz peak
    f = np.fft.rfft(np.asarray(wav)[0] * np.hanning(8000))
    freqs = np.fft.rfftfreq(8000, 1 / 16000)
    peak = freqs[np.argmax(np.abs(f))]
    assert abs(peak - 500) < 10, f"GL peak at {peak} Hz"


def test_tacotron2_overfit_and_inference():
    """Tacotron2 teacher-forced training converges on one utterance; the
    free-running decode stops and attention is roughly monotone."""
    import optax

    from llm_guided_asr_tpu.models.tacotron2 import Tacotron2, Tacotron2Config

    cfg = Tacotron2Config(
        vocab_size=12, n_mels=10, embed_dim=32, econv_filters=32,
        elstm_units=16, att_dim=16, prenet_units=16, dlstm_units=32,
        postnet_filters=32,
    )
    model = Tacotron2(cfg)
    rng = np.random.default_rng(0)
    text = jnp.asarray([[2, 3, 4, 5, 6]], jnp.int32)
    tlens = jnp.asarray([5])
    # target mel: each token paints 4 frames with a token-specific pattern
    base = rng.standard_normal((12, 10)).astype(np.float32)
    mel = np.repeat(base[np.asarray(text)[0]], 4, axis=0)[None]
    mels = jnp.asarray(mel)
    mlens = jnp.asarray([mel.shape[1]])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text, tlens, mels, mlens, deterministic=True,
    )
    tx = optax.adam(2e-3)
    params = variables["params"]
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (loss, stats), g = jax.value_and_grad(
            lambda p: model.apply({"params": p}, text, tlens, mels, mlens,
                                  deterministic=True)[:2],
            has_aux=True,
        )(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    _, _, loss0 = step(params, opt)
    for _ in range(200):
        params, opt, loss = step(params, opt)
    assert float(loss) < 0.5 * float(loss0), (float(loss0), float(loss))

    out_mel, n_frames, att = model.apply(
        {"params": params}, text, tlens, max_frames=40, method=model.inference
    )
    assert out_mel.shape == (1, 40, 10)
    assert 0 < int(n_frames[0]) <= 40
    assert np.all(np.isfinite(np.asarray(out_mel)))


def test_tacotron2_task_builder():
    from llm_guided_asr_tpu.tasks.generic import TASK_BUILDERS

    model, adapter, dummy = TASK_BUILDERS["tts"]({
        "tts": "tacotron2",
        "model_conf": {"vocab_size": 12, "n_mels": 8, "adim": 16,
                       "dlstm_units": 16, "elstm_units": 8, "att_dim": 8},
    })
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        *dummy, deterministic=True,
    )
    loss, stats, w = model.apply(variables, *adapter({
        "text": dummy[0], "text_lengths": dummy[1],
        "speech": dummy[2], "speech_lengths": dummy[3],
    }), deterministic=True)
    assert np.isfinite(float(loss))
