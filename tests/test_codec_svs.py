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


def test_svs_xiaoice_pitch_vuv_syllable():
    """XiaoiceSing2 criteria: pitch MSE + VUV BCE + syllable duration loss
    (XiaoiceSing.py lambda_*, xiaoice/loss.py:18)."""
    from llm_guided_asr_tpu.models.svs import midi_to_log_f0, note_segment_sum

    cfg = SVSConfig(
        tts=FastSpeech2Config(vocab_size=20, n_mels=16, adim=16, heads=2,
                              eunits=24, elayers=1, dlayers=1),
        n_midi=64, lambda_pitch=0.1, lambda_vuv=0.1, lambda_syllable=0.1,
    )
    model = SVSModel(cfg)
    rng = np.random.default_rng(0)
    text = jnp.asarray([[3, 4, 5, -1]], jnp.int32)
    tlens = jnp.asarray([3])
    dur = jnp.asarray([[3, 2, 4, 0]], jnp.int32)
    midi = jnp.asarray([[40, 40, 47, 0]], jnp.int32)  # first note spans 2 phones
    speech = jnp.asarray(rng.standard_normal((1, 9, 16)), jnp.float32)
    slens = jnp.asarray([9])
    pitch = jnp.asarray(np.abs(rng.standard_normal((1, 9))) + 4.0, jnp.float32)
    pitch = pitch.at[0, 7:].set(0.0)  # unvoiced tail
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text, tlens, speech, slens, dur, None, midi, None, pitch,
        deterministic=True,
    )
    loss, stats, _ = model.apply(
        variables, text, tlens, speech, slens, dur, None, midi, None, pitch,
        deterministic=True,
    )
    assert np.isfinite(float(loss))
    for k in ("loss_pitch", "loss_vuv", "loss_syllable"):
        assert k in stats and np.isfinite(float(stats[k])), k

    # note_segment_sum groups same-note runs: durations [3,2,4] with notes
    # [40,40,47] -> syllable targets [5, 4]
    sums, seg_valid = note_segment_sum(
        dur.astype(jnp.float32), midi, jnp.asarray([[True, True, True, False]])
    )
    assert np.asarray(seg_valid)[0, :2].all() and not np.asarray(seg_valid)[0, 2]
    np.testing.assert_allclose(np.asarray(sums)[0, :2], [5.0, 4.0])

    # A4 = 440 Hz
    np.testing.assert_allclose(
        float(midi_to_log_f0(jnp.asarray([69]))[0]), np.log(440.0), rtol=1e-6
    )


def test_svs_naive_rnn_trains_and_infers():
    """naive_rnn family (naive_rnn.py:86): BiLSTM enc/dec + postnet, masked
    L1+MSE on before/after-postnet outputs."""
    import optax

    from llm_guided_asr_tpu.models.svs import NaiveRNNSVS

    cfg = SVSConfig(
        tts=FastSpeech2Config(vocab_size=20, n_mels=12, adim=16),
        n_midi=64, model_type="naive_rnn", rnn_units=16,
        postnet_layers=2, postnet_chans=16,
    )
    model = NaiveRNNSVS(cfg)
    rng = np.random.default_rng(1)
    text = jnp.asarray([[3, 4, 5, -1]], jnp.int32)
    tlens = jnp.asarray([3])
    dur = jnp.asarray([[3, 2, 4, 0]], jnp.int32)
    midi = jnp.asarray([[40, 45, 47, 0]], jnp.int32)
    speech = jnp.asarray(rng.standard_normal((1, 9, 12)), jnp.float32)
    slens = jnp.asarray([9])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text, tlens, speech, slens, dur, None, midi, deterministic=True,
    )
    tx = optax.adam(1e-2)
    params = variables["params"]
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        def loss_fn(p):
            loss, stats, _ = model.apply(
                {"params": p}, text, tlens, speech, slens, dur, None, midi,
                deterministic=True,
            )
            return loss
        l, g = jax.value_and_grad(loss_fn)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    losses = []
    for _ in range(20):
        params, opt, l = step(params, opt)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.8, losses[::5]

    mel, mel_lens = model.apply(
        {"params": params}, text, tlens, midi, dur, t_max=16,
        method=model.inference,
    )
    assert mel.shape == (1, 16, 12) and int(mel_lens[0]) == 9
    assert np.all(np.isfinite(np.asarray(mel)))


def test_transformer_tts_trains_and_stops():
    """Transformer-TTS (e2e_tts_transformer.py): teacher-forced loss with
    stop-token BCE + guided attention; AR inference terminates on stop."""
    import optax

    from llm_guided_asr_tpu.models.tts import TransformerTTS, TransformerTTSConfig

    cfg = TransformerTTSConfig(vocab_size=12, n_mels=8, adim=16, heads=2,
                               eunits=24, elayers=1, dlayers=1,
                               prenet_units=8, postnet_layers=2,
                               postnet_chans=8)
    model = TransformerTTS(cfg)
    rng = np.random.default_rng(0)
    text = jnp.asarray([[3, 4, 5, -1]], jnp.int32)
    tlens = jnp.asarray([3])
    speech = jnp.asarray(rng.standard_normal((1, 10, 8)), jnp.float32)
    slens = jnp.asarray([10])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text, tlens, speech, slens, deterministic=True,
    )
    loss, stats, _ = model.apply(
        variables, text, tlens, speech, slens, deterministic=True
    )
    assert np.isfinite(float(loss))
    for k in ("loss_mel", "loss_stop", "loss_guided_attn"):
        assert k in stats, stats.keys()

    tx = optax.adam(1e-2)
    params, opt = variables["params"], None
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        def loss_fn(p):
            l, _, _ = model.apply({"params": p}, text, tlens, speech, slens,
                                  deterministic=True)
            return l
        l, g = jax.value_and_grad(loss_fn)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    losses = []
    for _ in range(30):
        params, opt, l = step(params, opt)
        losses.append(float(l))
    assert losses[-1] < losses[0], losses[::10]

    mel, lens = model.apply({"params": params}, text, tlens, t_max=20,
                            method=model.inference)
    assert mel.shape == (1, 20, 8)
    assert 1 <= int(lens[0]) <= 20
    assert np.all(np.isfinite(np.asarray(mel)))


def test_fastspeech1_task_ignores_pitch_energy(tmp_path):
    """tts: fastspeech (FastSpeech1) drops pitch/energy streams at the
    adapter so the variance adaptors beyond duration never engage."""
    from llm_guided_asr_tpu.tasks.generic import GenericTask

    tokens = tmp_path / "tokens.txt"
    tokens.write_text("\n".join(["<blank>", "<unk>", "a", "b", "<sos/eos>"]) + "\n")
    config = {
        **GenericTask.get_default_config(),
        "task": "tts", "tts": "fastspeech",
        "token_list": str(tokens),
        "model_conf": {"n_mels": 12, "adim": 16, "heads": 2, "eunits": 24,
                       "elayers": 1, "dlayers": 1},
    }
    model, adapter, dummy = GenericTask.build(config)
    batch = {
        "text": dummy[0], "text_lengths": dummy[1],
        "speech": dummy[2], "speech_lengths": dummy[3],
        "durations": dummy[4], "durations_lengths": dummy[5],
        # even if the data dir provides pitch/energy, FS1 must not see them
        "pitch": jnp.ones_like(dummy[4], jnp.float32),
        "energy": jnp.ones_like(dummy[4], jnp.float32),
    }
    args = adapter(batch)
    assert args[6] is None and args[7] is None
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        *args, deterministic=True,
    )
    loss, stats, _ = model.apply(variables, *args, deterministic=True)
    assert np.isfinite(float(loss))
    assert "loss_pitch" not in stats and "loss_energy" not in stats
