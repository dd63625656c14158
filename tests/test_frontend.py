"""Frontend numerics parity vs torch.stft / librosa-formula mel.

The reference frontend is torch.stft + librosa.filters.mel
(espnet2/layers/stft.py:17, log_mel.py:9); these tests pin our JAX pipeline
to the same numerics on random audio.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from llm_guided_asr_tpu.ops.frontend import (
    default_frontend,
    mel_filterbank,
    stft,
    stft_out_lengths,
)


def test_stft_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4000)).astype(np.float32)
    ours = np.asarray(stft(jnp.asarray(x), n_fft=512, hop_length=128))
    ref = torch.stft(
        torch.from_numpy(x),
        n_fft=512,
        hop_length=128,
        window=torch.hann_window(512),
        center=True,
        return_complex=True,
    ).numpy()  # [B, F, T]
    ref = np.transpose(ref, (0, 2, 1))  # [B, T, F]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours.real, ref.real, atol=2e-3)
    np.testing.assert_allclose(ours.imag, ref.imag, atol=2e-3)


def test_stft_win_length_padding():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 2000)).astype(np.float32)
    ours = np.asarray(stft(jnp.asarray(x), n_fft=512, win_length=400, hop_length=160))
    ref = torch.stft(
        torch.from_numpy(x),
        n_fft=512,
        win_length=400,
        hop_length=160,
        window=torch.hann_window(400),
        center=True,
        return_complex=True,
    ).numpy()
    ref = np.transpose(ref, (0, 2, 1))
    np.testing.assert_allclose(ours.real, ref.real, atol=2e-3)
    np.testing.assert_allclose(ours.imag, ref.imag, atol=2e-3)


def test_mel_filterbank_properties():
    fb = mel_filterbank(16000, 512, 80)
    assert fb.shape == (257, 80)
    assert np.all(fb >= 0)
    # every filter has support
    assert np.all(fb.sum(axis=0) > 0)
    # analytic spot-check of the Slaney formula for filter 0:
    # mel_max = 15 + ln(8)/(ln(6.4)/27); 81 intervals; hz[1] = spacing*200/3
    mel_max = 15.0 + np.log(8.0) / (np.log(6.4) / 27.0)
    hz1 = (mel_max / 81.0) * (200.0 / 3.0)
    hz2 = 2 * hz1
    enorm = 2.0 / hz2
    np.testing.assert_allclose(fb[1, 0], (31.25 / hz1) * enorm, rtol=1e-5)
    np.testing.assert_allclose(fb[2, 0], ((hz2 - 62.5) / hz1) * enorm, rtol=1e-4)


def test_default_frontend_shapes_and_lengths():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 16000)).astype(np.float32)
    lens = jnp.asarray([16000, 8000, 4000])
    feats, olens = jax.jit(default_frontend)(jnp.asarray(x), lens)
    assert feats.shape[0] == 3 and feats.shape[2] == 80
    np.testing.assert_array_equal(
        np.asarray(olens), np.asarray(stft_out_lengths(lens))
    )
    # padded frames are zeroed
    f = np.asarray(feats)
    assert np.all(f[2, int(olens[2]) :] == 0.0)
    assert np.any(f[2, : int(olens[2])] != 0.0)


def test_logmel_matches_manual():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 8000)).astype(np.float32)
    feats, _ = default_frontend(jnp.asarray(x), jnp.asarray([8000]))
    # manual recompute with torch stft + our filterbank
    spec = torch.stft(
        torch.from_numpy(x), n_fft=512, hop_length=128,
        window=torch.hann_window(512), center=True, return_complex=True,
    ).numpy()
    power = (np.abs(spec) ** 2).transpose(0, 2, 1)
    mel = np.maximum(power @ mel_filterbank(16000, 512, 80), 1e-10)
    np.testing.assert_allclose(np.asarray(feats), np.log(mel), atol=2e-2, rtol=1e-3)


def test_speed_perturb():
    from llm_guided_asr_tpu.ops.augment import perturb_dataset_speeds, speed_perturb

    t = np.arange(16000) / 16000.0
    tone = np.sin(2 * np.pi * 400.0 * t).astype(np.float32)
    fast = speed_perturb(tone, 1.1)
    slow = speed_perturb(tone, 0.9)
    assert abs(len(fast) - 16000 / 1.1) <= 1
    assert abs(len(slow) - 16000 / 0.9) <= 1
    # pitch scales with speed: dominant frequency moves to 400*factor
    for sig, factor in [(fast, 1.1), (slow, 0.9)]:
        spec = np.abs(np.fft.rfft(sig * np.hanning(len(sig))))
        freqs = np.fft.rfftfreq(len(sig), 1 / 16000)
        peak = freqs[int(np.argmax(spec))]
        assert abs(peak - 400 * factor) < 8, (factor, peak)
    out = perturb_dataset_speeds([("u0", tone)], (0.9, 1.0, 1.1))
    assert [u for u, _ in out] == ["sp0.9-u0", "u0", "sp1.1-u0"]


def test_rir_and_noise_aug():
    from llm_guided_asr_tpu.ops.augment import WavAugPreprocessor, add_noise, apply_rir

    rng = np.random.default_rng(0)
    wav = np.sin(2 * np.pi * 300 * np.arange(4000) / 16000).astype(np.float32) * 0.5
    rir = np.zeros(100, np.float32)
    rir[0] = 1.0
    rir[50] = 0.5  # one echo
    wet = apply_rir(wav, rir)
    assert wet.shape == wav.shape
    # power-normalized to the dry signal
    np.testing.assert_allclose(np.mean(wet**2), np.mean(wav**2), rtol=1e-3)

    noise = rng.standard_normal(2000).astype(np.float32)
    noisy = add_noise(wav, noise, snr_db=10.0, rng=rng)
    res = noisy - wav
    snr = 10 * np.log10(np.mean(wav**2) / np.mean(res**2))
    assert abs(snr - 10.0) < 0.5

    pre = WavAugPreprocessor(rirs=[rir], noises=[noise], noise_db_range=(10, 10))
    out = pre("u0", {"speech": wav, "text": "abc"})
    assert out["speech"].shape == wav.shape
    assert not np.allclose(out["speech"], wav)
    assert out["text"] == "abc"
