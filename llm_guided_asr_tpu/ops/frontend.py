"""Fused speech frontend: STFT -> power -> log-mel -> global MVN.

TPU-native rebuild of the reference frontend stack
(espnet2/asr/frontend/default.py:17, espnet2/layers/stft.py:17,
espnet2/layers/log_mel.py:9, espnet2/layers/global_mvn.py:13,
espnet2/layers/utterance_mvn.py:10).

Numerics parity notes:
- STFT matches ``torch.stft(center=True, window=hann(periodic))`` /
  librosa.stft: reflect-pad n_fft//2 on each side, frame stride hop,
  one-sided rFFT.  Frame count = (nsamples + 2*(n_fft//2) - n_fft)//hop + 1.
- The mel filterbank matches ``librosa.filters.mel`` (Slaney mel scale,
  slaney area normalization) — the reference embeds librosa's matrix as a
  buffer (log_mel.py:50); we compute the same matrix from the formula.
- log-mel clamps power at 1e-10 then takes the natural log (log_mel.py:64-67).

The whole pipeline is a single jitted function of static-shape [B, S] audio;
XLA fuses window/power/log elementwise work into the surrounding matmuls.
The mel projection is a [F, M] matmul that lands on the MXU.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from llm_guided_asr_tpu.utils.masks import make_valid_mask, mask_fill


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    """Config mirror of DefaultFrontend kwargs (default.py:24-40)."""

    fs: int = 16000
    n_fft: int = 512
    win_length: Optional[int] = None
    hop_length: int = 128
    n_mels: int = 80
    fmin: float = 0.0
    fmax: Optional[float] = None
    htk: bool = False
    center: bool = True
    window: Optional[str] = "hann"
    # multichannel path (default.py's optional enh Frontend: WPE + MVDR);
    # engaged when the input speech is [B, S, C]
    use_wpe: bool = False
    wpe_taps: int = 5
    wpe_delay: int = 3
    wpe_iterations: int = 2
    use_beamformer: bool = False
    mask_units: int = 64
    ref_channel: int = 0
    # fused multi-resolution frontends (fused.py FusedFrontends): tuple of
    # (n_fft, hop_length, n_mels) triples; empty = single default frontend
    fused: Tuple[Tuple[int, int, int], ...] = ()
    proj_dim: int = 100
    # "default" (log-mel) | "sliding_window" (raw frames for the sinc
    # preencoder, espnet2/asr/frontend/windowing.py)
    type: str = "default"

    @property
    def output_dim(self) -> int:
        if self.type == "sliding_window":
            return self.win_length or 400
        return self.proj_dim * len(self.fused) if self.fused else self.n_mels

    @classmethod
    def from_dict(cls, d: dict) -> "FrontendConfig":
        from llm_guided_asr_tpu.utils.config import filter_known_fields

        d = filter_known_fields(cls, d, "frontend_conf")
        if d.get("fmin") is None:
            d["fmin"] = 0.0
        if d.get("fused"):
            d["fused"] = tuple(tuple(f) for f in d["fused"])
        return cls(**d)


# ---------------------------------------------------------------------------
# Mel filterbank (librosa-compatible, computed host-side once)
# ---------------------------------------------------------------------------

def _hz_to_mel(freqs: np.ndarray, htk: bool = False) -> np.ndarray:
    freqs = np.asarray(freqs, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + freqs / 700.0)
    # Slaney: linear below 1 kHz, log above.
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freqs - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = freqs >= min_log_hz
    mels = np.where(
        above, min_log_mel + np.log(np.maximum(freqs, 1e-10) / min_log_hz) / logstep, mels
    )
    return mels


def _mel_to_hz(mels: np.ndarray, htk: bool = False) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = mels >= min_log_mel
    freqs = np.where(above, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    fs: int = 16000,
    n_fft: int = 512,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    htk: bool = False,
) -> np.ndarray:
    """[n_fft//2+1, n_mels] triangular mel filterbank, Slaney-normalized."""
    if fmax is None:
        fmax = fs / 2.0
    fftfreqs = np.linspace(0.0, fs / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(_hz_to_mel(fmin, htk), _hz_to_mel(fmax, htk), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, htk)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney area normalization
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights = weights * enorm[:, None]
    return weights.T.astype(np.float32)  # [F, M]


# ---------------------------------------------------------------------------
# STFT
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _hann_window(win_length: int) -> np.ndarray:
    # Periodic Hann, matching torch.hann_window(periodic=True).
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def stft_frames(nsamples: int, n_fft: int = 512, hop_length: int = 128, center: bool = True) -> int:
    """Static frame count for a given sample count."""
    if center:
        nsamples = nsamples + 2 * (n_fft // 2)
    return (nsamples - n_fft) // hop_length + 1


def stft_out_lengths(ilens: jnp.ndarray, n_fft: int = 512, hop_length: int = 128, center: bool = True) -> jnp.ndarray:
    """Per-utterance valid frame counts (stft.py:163-171)."""
    if center:
        ilens = ilens + 2 * (n_fft // 2)
    return (ilens - n_fft) // hop_length + 1


def stft(
    speech: jnp.ndarray,
    n_fft: int = 512,
    win_length: Optional[int] = None,
    hop_length: int = 128,
    center: bool = True,
    window: Optional[str] = "hann",
) -> jnp.ndarray:
    """[B, S] -> complex [B, T, F] one-sided STFT (librosa/torch compatible)."""
    if win_length is None:
        win_length = n_fft
    if center:
        pad = n_fft // 2
        speech = jnp.pad(speech, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = (speech.shape[1] - n_fft) // hop_length + 1
    idx = jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    frames = speech[:, idx]  # [B, T, n_fft]
    if window is not None:
        if window != "hann":
            raise ValueError(f"unsupported window: {window}")
        w = _hann_window(win_length)
        if win_length < n_fft:  # center-pad window to n_fft like torch.stft
            left = (n_fft - win_length) // 2
            w = np.pad(w, (left, n_fft - win_length - left))
        frames = frames * jnp.asarray(w)
    return jnp.fft.rfft(frames, axis=-1)


def stft_power(
    speech: jnp.ndarray,
    n_fft: int = 512,
    win_length: Optional[int] = None,
    hop_length: int = 128,
    center: bool = True,
    window: Optional[str] = "hann",
    precision=None,
) -> jnp.ndarray:
    """[B, S] -> [B, T, F] one-sided power spectrum, via a strided DFT conv.

    Numerically equivalent to |stft(...)|^2, but TPU-shaped: the
    frame-gather (``speech[:, idx]`` — measured ~1.3 ms/step at B=32) and
    ``jnp.fft.rfft`` (XLA TPU FFT decomposition — ~2.5 ms) are replaced by
    one strided f32 convolution against the windowed DFT basis
    (kernel [n_fft, 1, 2F]; cos and sin stacked on the channel axis), which
    runs on the MXU. The default precision=HIGHEST keeps f32 accuracy for
    the torch-parity tests (6-pass f32 emulation, ~1.3 ms/step at B=32 x
    10 s); a bf16-compute model may pass a lower precision — the features
    feed log-compression + MVN, so the LSBs a 1-pass matmul loses are far
    below SpecAug/dropout noise.
    """
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    if win_length is None:
        win_length = n_fft
    if center:
        pad = n_fft // 2
        speech = jnp.pad(speech, ((0, 0), (pad, pad)), mode="reflect")
    f = n_fft // 2 + 1
    w = np.ones(n_fft, np.float32)
    if window is not None:
        if window != "hann":
            raise ValueError(f"unsupported window: {window}")
        wv = _hann_window(win_length)
        if win_length < n_fft:
            left = (n_fft - win_length) // 2
            wv = np.pad(wv, (left, n_fft - win_length - left))
        w = wv
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(f, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft  # [n_fft, F]
    basis = np.concatenate(
        [np.cos(ang), -np.sin(ang)], axis=1
    ).astype(np.float32) * w[:, None]  # [n_fft, 2F]
    n_frames = (speech.shape[1] - n_fft) // hop_length + 1
    g = int(np.gcd(n_fft, hop_length))
    if g >= 8:
        # Block-matmul framing: a stride-`hop` window conv with 1 input
        # channel keeps the MXU nearly idle (XLA lowers it as a skinny
        # conv — measured 10.8 ms fwd / 64 ms bwd at B=32 x 10 s).  With
        # g = gcd(n_fft, hop) the signal splits into [B, NB, g] blocks;
        # frame t is the concat of n_fft/g consecutive blocks starting at
        # block t*(hop/g), so framing is n_fft/g strided slices + concat
        # (pure copies) and the whole DFT is ONE [B*T, n_fft] @ [n_fft, 2F]
        # matmul (~0.4 ms for the same shapes, fwd AND bwd MXU-shaped).
        n_blk, stride_blk = n_fft // g, hop_length // g
        # need = (n_frames-1)*hop + n_fft is a sum of multiples of g, so it
        # always reshapes cleanly into g-sized blocks (no pad branch needed).
        need = (n_frames - 1) * hop_length + n_fft
        blocks = speech[:, :need].reshape(speech.shape[0], -1, g)  # [B, NB, g]
        frames = jnp.concatenate(
            [
                jax.lax.slice_in_dim(
                    blocks, j, j + (n_frames - 1) * stride_blk + 1, stride_blk,
                    axis=1,
                )
                for j in range(n_blk)
            ],
            axis=-1,
        )  # [B, T, n_fft]
        out = jnp.einsum(
            "btn,nf->btf", frames, jnp.asarray(basis),
            precision=precision,
        )
    else:
        out = jax.lax.conv_general_dilated(
            speech[:, :, None],  # [B, S, 1]
            jnp.asarray(basis)[:, None, :],  # [n_fft, 1, 2F]
            window_strides=(hop_length,),
            padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            precision=precision,
        )  # [B, T, 2F]
    return out[..., :f] ** 2 + out[..., f:] ** 2


# ---------------------------------------------------------------------------
# Log-mel + MVN
# ---------------------------------------------------------------------------

def istft(
    spec: jnp.ndarray,  # complex [B, T, F]
    n_fft: int = 512,
    win_length: Optional[int] = None,
    hop_length: int = 128,
    center: bool = True,
    window: Optional[str] = "hann",
    length: Optional[int] = None,
) -> jnp.ndarray:
    """Inverse STFT via windowed overlap-add (stft.py:178 inverse analog)."""
    if win_length is None:
        win_length = n_fft
    b, t, f = spec.shape
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)  # [B, T, n_fft]
    w = _hann_window(win_length)
    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        w = np.pad(w, (left, n_fft - win_length - left))
    wj = jnp.asarray(w)
    frames = frames * wj
    total = (t - 1) * hop_length + n_fft
    out = jnp.zeros((b, total))
    norm = jnp.zeros((total,))
    idx = jnp.arange(t)[:, None] * hop_length + jnp.arange(n_fft)[None, :]  # [T, n_fft]
    out = out.at[:, idx.reshape(-1)].add(frames.reshape(b, -1))
    norm = norm.at[idx.reshape(-1)].add(jnp.tile(wj**2, (t,)))
    out = out / jnp.maximum(norm, 1e-8)[None, :]
    if center:
        pad = n_fft // 2
        out = out[:, pad:]
        if length is not None:
            out = out[:, :length]
        else:
            out = out[:, : total - 2 * pad]
    elif length is not None:
        out = out[:, :length]
    return out


def logmel_from_power(
    power: jnp.ndarray,
    fs: int = 16000,
    n_fft: int = 512,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    htk: bool = False,
) -> jnp.ndarray:
    """[B, T, F] power spectrum -> [B, T, M] natural-log mel (log_mel.py:57-73)."""
    melmat = jnp.asarray(mel_filterbank(fs, n_fft, n_mels, fmin, fmax, htk))
    mel = jnp.maximum(power @ melmat, 1e-10)
    return jnp.log(mel)


def global_mvn(
    feats: jnp.ndarray,
    mean: jnp.ndarray,
    inv_std: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
    norm_means: bool = True,
    norm_vars: bool = True,
) -> jnp.ndarray:
    """Global CMVN from collect-stats artifacts (global_mvn.py:13)."""
    if norm_means:
        feats = feats - mean
    if norm_vars:
        feats = feats * inv_std
    if lengths is not None:
        feats = mask_fill(feats, make_valid_mask(lengths, feats.shape[1]))
    return feats


def utterance_mvn(
    feats: jnp.ndarray,
    lengths: jnp.ndarray,
    norm_means: bool = True,
    norm_vars: bool = False,
    eps: float = 1.0e-20,
) -> jnp.ndarray:
    """Per-utterance MVN (utterance_mvn.py:10)."""
    valid = make_valid_mask(lengths, feats.shape[1])[..., None]
    denom = jnp.maximum(lengths[:, None, None].astype(feats.dtype), 1.0)
    mean = jnp.sum(jnp.where(valid, feats, 0.0), axis=1, keepdims=True) / denom
    if norm_means:
        feats = jnp.where(valid, feats - mean, 0.0)
        if norm_vars:
            var = jnp.sum(jnp.where(valid, feats**2, 0.0), axis=1, keepdims=True) / denom
            feats = feats * jax.lax.rsqrt(jnp.maximum(var, eps))
            feats = jnp.where(valid, feats, 0.0)
    else:
        if norm_vars:
            sq = jnp.sum(jnp.where(valid, (feats - mean) ** 2, 0.0), axis=1, keepdims=True) / denom
            feats = feats * jax.lax.rsqrt(jnp.maximum(sq, eps))
            feats = jnp.where(valid, feats, 0.0)
    return feats


def default_frontend(
    speech: jnp.ndarray,
    speech_lengths: jnp.ndarray,
    fs: int = 16000,
    n_fft: int = 512,
    win_length: Optional[int] = None,
    hop_length: int = 128,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    htk: bool = False,
    center: bool = True,
    window: Optional[str] = "hann",
    precision=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, S] audio -> ([B, T, n_mels] log-mel, [B] frame lengths).

    The full DefaultFrontend path (default.py:82-117) in one jitted graph:
    STFT -> power -> mel matmul -> clamp/log -> zero padding frames.
    ``precision`` relaxes the DFT matmul for bf16-compute models (see
    stft_power); None keeps the f32-exact default.
    """
    power = stft_power(
        speech.astype(jnp.float32), n_fft, win_length, hop_length, center,
        window, precision=precision,
    )
    feats = logmel_from_power(power, fs, n_fft, n_mels, fmin, fmax, htk)
    olens = stft_out_lengths(speech_lengths, n_fft, hop_length, center)
    # clamp: a caller-provided length beyond the sample axis must not yield
    # olens > T (masking downstream assumes olens indexes into the frame axis)
    olens = jnp.clip(olens, 0, feats.shape[1])
    feats = mask_fill(feats, make_valid_mask(olens, feats.shape[1]))
    return feats, olens


def whisper_frontend(
    speech: jnp.ndarray,  # [B, S] 16 kHz
    speech_lengths: jnp.ndarray,
    n_mels: int = 80,
    chunk_seconds: float = 30.0,
    fs: int = 16000,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Whisper's log-mel convention (asr/frontend/whisper.py WhisperFrontend):
    n_fft 400, hop 160, slaney mel, log10 with dynamic-range clamp to 8 dB
    below the max, then (x + 4) / 4; audio padded/trimmed to 30 s."""
    n_fft, hop = 400, 160
    target = int(chunk_seconds * fs)
    b, s = speech.shape
    if s < target:
        speech = jnp.pad(speech, ((0, 0), (0, target - s)))
    else:
        speech = speech[:, :target]
    spec = stft(speech.astype(jnp.float32), n_fft=n_fft, hop_length=hop,
                center=True, window="hann")
    # whisper drops the final frame
    spec = spec[:, :-1]
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    melmat = jnp.asarray(mel_filterbank(fs, n_fft, n_mels, 0.0, None, htk=False))
    mel = jnp.maximum(power @ melmat, 1e-10)
    log_spec = jnp.log10(mel)
    log_spec = jnp.maximum(
        log_spec, jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0
    )
    feats = (log_spec + 4.0) / 4.0
    olens = jnp.clip(
        jnp.minimum(speech_lengths, target) // hop, 0, feats.shape[1]
    )
    return feats, jnp.full_like(olens, feats.shape[1])


class MultichannelFrontend(nn.Module):
    """Multichannel DefaultFrontend: STFT -> (opt) WPE -> mask-based MVDR ->
    power -> log-mel.

    Rebuild of the DefaultFrontend path with a multichannel ``Frontend``
    (espnet2/asr/frontend/default.py + enh/layers/wpe.py,
    enh/layers/dnn_beamformer.py): the mask estimator is a small BiLSTM over
    the reference channel's log magnitude emitting speech/noise masks; its
    parameters train jointly with the recognizer.
    speech: [B, S, C] multichannel waveform.
    """

    n_fft: int = 512
    win_length: "Optional[int]" = None
    hop_length: int = 128
    n_mels: int = 80
    fs: int = 16000
    fmin: float = 0.0
    fmax: "Optional[float]" = None
    htk: bool = False
    center: bool = True
    window: "Optional[str]" = "hann"
    use_wpe: bool = False
    wpe_taps: int = 5
    wpe_delay: int = 3
    wpe_iterations: int = 2
    use_beamformer: bool = True
    mask_units: int = 64
    ref_channel: int = 0

    @nn.compact
    def __call__(self, speech, speech_lengths, deterministic: bool = True):
        from llm_guided_asr_tpu.ops.beamformer import mvdr_beamform, wpe_dereverb

        b, s, c = speech.shape
        # per-channel STFT: [B*C, T, F] -> [B, F, C, T]
        flat = jnp.moveaxis(speech, -1, 1).reshape(b * c, s)
        spec = stft(flat.astype(jnp.float32), self.n_fft, self.win_length,
                    self.hop_length, self.center, self.window)
        t, f = spec.shape[1], spec.shape[2]
        y = jnp.transpose(spec.reshape(b, c, t, f), (0, 3, 1, 2))  # [B,F,C,T]
        if self.use_wpe:
            y = wpe_dereverb(y, self.wpe_taps, self.wpe_delay,
                             self.wpe_iterations)
        if self.use_beamformer:
            # mask estimator on the reference channel log-magnitude [B, T, F]
            logmag = jnp.log(jnp.abs(y[:, :, self.ref_channel, :]) + 1e-6)
            h = jnp.transpose(logmag, (0, 2, 1))  # [B, T, F]
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.mask_units),
                         name="mask_lstm_f")(h)
            bwd = nn.RNN(nn.OptimizedLSTMCell(self.mask_units), reverse=True,
                         keep_order=True, name="mask_lstm_b")(h)
            hh = jnp.concatenate([fwd, bwd], axis=-1)
            masks = jax.nn.sigmoid(
                nn.Dense(2 * f, name="mask_out")(hh)
            )  # [B, T, 2F]
            m_s = jnp.transpose(masks[..., :f], (0, 2, 1))  # [B, F, T]
            m_n = jnp.transpose(masks[..., f:], (0, 2, 1))
            enhanced = mvdr_beamform(y, m_s, m_n, self.ref_channel)  # [B,F,T]
        else:
            enhanced = y[:, :, self.ref_channel, :]
        power = jnp.transpose(
            jnp.real(enhanced) ** 2 + jnp.imag(enhanced) ** 2, (0, 2, 1)
        )  # [B, T, F]
        feats = logmel_from_power(power, self.fs, self.n_fft, self.n_mels,
                                  self.fmin, self.fmax, self.htk)
        olens = stft_out_lengths(speech_lengths, self.n_fft, self.hop_length,
                                 self.center)
        olens = jnp.clip(olens, 0, feats.shape[1])
        feats = mask_fill(feats, make_valid_mask(olens, feats.shape[1]))
        return feats, olens


class FusedFrontend(nn.Module):
    """Multi-resolution fused frontend (espnet2/asr/frontend/fused.py
    FusedFrontends, align_method=linear_projection): several default
    frontends with different STFT resolutions, each linear-projected to
    ``proj_dim``, frame-aligned to the first frontend's rate, concatenated.

    frontends: ((n_fft, hop_length, n_mels), ...) — output dim is
    proj_dim * len(frontends).
    """

    frontends: Tuple[Tuple[int, int, int], ...]
    proj_dim: int = 100
    fs: int = 16000

    @nn.compact
    def __call__(self, speech, speech_lengths, deterministic: bool = True):
        outs = []
        t0 = None
        lens0 = None
        for i, (n_fft, hop, mels) in enumerate(self.frontends):
            f, l = default_frontend(
                speech, speech_lengths, fs=self.fs, n_fft=n_fft,
                hop_length=hop, n_mels=mels,
            )
            p = nn.Dense(self.proj_dim, name=f"proj_{i}")(f)
            if i == 0:
                t0, lens0 = p.shape[1], l
            else:
                # nearest-index resample to the first frontend's frame rate
                idx = jnp.clip(
                    (jnp.arange(t0) * p.shape[1]) // t0, 0, p.shape[1] - 1
                )
                p = p[:, idx]
            outs.append(p)
        feats = jnp.concatenate(outs, axis=-1)
        feats = mask_fill(feats, make_valid_mask(lens0, t0))
        return feats, lens0
