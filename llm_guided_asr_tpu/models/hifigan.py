"""HiFiGAN-style neural vocoder + discriminators (espnet2/gan_tts rebuild).

Minimal-but-real mirror of espnet2/gan_tts/hifigan/: a transposed-conv
upsampling generator with multi-receptive-field residual blocks, multi-scale
and multi-period discriminators, and the standard GAN criterion set
(LSGAN adversarial + feature matching + mel-spectrogram L1) used by the
two-optimizer GANTrainer (train/gan_trainer.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


@dataclasses.dataclass(frozen=True)
class HiFiGANConfig:
    n_mels: int = 80
    channels: int = 128
    upsample_rates: Tuple[int, ...] = (8, 8, 2)  # prod = hop_length
    upsample_kernels: Tuple[int, ...] = (16, 16, 4)
    resblock_kernels: Tuple[int, ...] = (3, 7)
    resblock_dilations: Tuple[int, ...] = (1, 3)
    # discriminators
    periods: Tuple[int, ...] = (2, 3)
    scales: int = 2
    disc_channels: int = 32


class ResBlock(nn.Module):
    kernel: int
    dilations: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            h = jax.nn.leaky_relu(x, 0.1)
            h = nn.Conv(x.shape[-1], (self.kernel,), kernel_dilation=(d,),
                        padding="SAME", dtype=self.dtype, name=f"conv_{i}")(h)
            x = x + h
        return x


class HiFiGANGenerator(nn.Module):
    cfg: HiFiGANConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        """[B, T, M] log-mel -> [B, T * prod(rates)] waveform in [-1, 1]."""
        cfg = self.cfg
        x = nn.Conv(cfg.channels, (7,), padding="SAME", dtype=self.dtype, name="pre")(mel)
        ch = cfg.channels
        for i, (r, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernels)):
            ch = max(ch // 2, 8)
            x = jax.nn.leaky_relu(x, 0.1)
            x = nn.ConvTranspose(ch, (k,), strides=(r,), padding="SAME",
                                 dtype=self.dtype, name=f"up_{i}")(x)
            acc = None
            for kern in cfg.resblock_kernels:
                h = ResBlock(kern, cfg.resblock_dilations, dtype=self.dtype,
                             name=f"res_{i}_{kern}")(x)
                acc = h if acc is None else acc + h
            x = acc / len(cfg.resblock_kernels)
        x = jax.nn.leaky_relu(x, 0.1)
        x = nn.Conv(1, (7,), padding="SAME", dtype=self.dtype, name="post")(x)
        return jnp.tanh(x)[..., 0]


class _ConvStack(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = []
        ch = self.channels
        for i, stride in enumerate((2, 2, 4)):
            x = nn.Conv(ch, (15 if i == 0 else 11,), strides=(stride,),
                        padding="SAME", dtype=self.dtype, name=f"conv_{i}")(x)
            x = jax.nn.leaky_relu(x, 0.1)
            feats.append(x)
            ch *= 2
        out = nn.Conv(1, (3,), padding="SAME", dtype=self.dtype, name="out")(x)
        feats.append(out)
        return out, feats


class HiFiGANDiscriminator(nn.Module):
    """Multi-scale + multi-period ensemble; returns (scores, feature maps)."""

    cfg: HiFiGANConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        cfg = self.cfg
        scores: List[jnp.ndarray] = []
        fmaps: List[jnp.ndarray] = []
        x0 = wav[..., None]  # [B, N, 1]
        # multi-scale
        x = x0
        for s in range(cfg.scales):
            out, feats = _ConvStack(cfg.disc_channels, dtype=self.dtype, name=f"msd_{s}")(x)
            scores.append(out)
            fmaps.extend(feats)
            x = nn.avg_pool(x, (4,), strides=(2,), padding="SAME")
        # multi-period: fold the signal into [B, N/p, p] "images"
        for p in cfg.periods:
            n = wav.shape[1] - wav.shape[1] % p
            xp = wav[:, :n].reshape(wav.shape[0], n // p, p)
            out, feats = _ConvStack(cfg.disc_channels, dtype=self.dtype, name=f"mpd_{p}")(xp)
            scores.append(out)
            fmaps.extend(feats)
        return scores, fmaps


# ---------------------------------------------------------------------------
# GAN criteria (gan_tts/hifigan/loss.py)
# ---------------------------------------------------------------------------

def lsgan_d_loss(real_scores, fake_scores) -> jnp.ndarray:
    loss = 0.0
    for r, f in zip(real_scores, fake_scores):
        loss = loss + jnp.mean((r - 1.0) ** 2) + jnp.mean(f**2)
    return loss / len(real_scores)


def lsgan_g_loss(fake_scores) -> jnp.ndarray:
    loss = 0.0
    for f in fake_scores:
        loss = loss + jnp.mean((f - 1.0) ** 2)
    return loss / len(fake_scores)


def feature_matching_loss(real_fmaps, fake_fmaps) -> jnp.ndarray:
    loss = 0.0
    for r, f in zip(real_fmaps, fake_fmaps):
        loss = loss + jnp.mean(jnp.abs(jax.lax.stop_gradient(r) - f))
    return loss / len(real_fmaps)


def mel_l1_loss(
    real_wav: jnp.ndarray, fake_wav: jnp.ndarray,
    n_fft: int = 512, hop_length: int = 128, n_mels: int = 80, fs: int = 16000,
) -> jnp.ndarray:
    from llm_guided_asr_tpu.ops.frontend import default_frontend

    n = jnp.full((real_wav.shape[0],), real_wav.shape[1], jnp.int32)
    m_real, _ = default_frontend(real_wav, n, fs=fs, n_fft=n_fft,
                                 hop_length=hop_length, n_mels=n_mels)
    m_fake, _ = default_frontend(fake_wav, n, fs=fs, n_fft=n_fft,
                                 hop_length=hop_length, n_mels=n_mels)
    return jnp.mean(jnp.abs(m_real - m_fake))


class MelGANGenerator(nn.Module):
    """MelGAN generator (espnet2/gan_tts/melgan/melgan.py): mel -> waveform
    via transposed-conv upsampling with dilated residual stacks and a tanh
    output; lighter than HiFiGAN (single kernel per stage)."""

    cfg: HiFiGANConfig  # shares the mel/upsample geometry
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = nn.Conv(cfg.channels, (7,), padding="SAME", dtype=self.dtype,
                    name="pre")(mel)
        ch = cfg.channels
        for i, r in enumerate(cfg.upsample_rates):
            ch = max(ch // 2, 8)
            x = jax.nn.leaky_relu(x, 0.2)
            x = nn.ConvTranspose(ch, (2 * r,), strides=(r,), padding="SAME",
                                 dtype=self.dtype, name=f"up_{i}")(x)
            # residual stack with dilations 1, 3, 9 (melgan.py ResidualStack)
            for j, d in enumerate((1, 3, 9)):
                h = jax.nn.leaky_relu(x, 0.2)
                h = nn.Conv(ch, (3,), kernel_dilation=(d,), padding="SAME",
                            dtype=self.dtype, name=f"res_{i}_{j}a")(h)
                h = jax.nn.leaky_relu(h, 0.2)
                h = nn.Conv(ch, (1,), dtype=self.dtype, name=f"res_{i}_{j}b")(h)
                x = x + h
        x = jax.nn.leaky_relu(x, 0.2)
        x = nn.Conv(1, (7,), padding="SAME", dtype=self.dtype, name="post")(x)
        return jnp.tanh(x)[..., 0]


class ParallelWaveGANDiscriminator(nn.Module):
    """Non-causal dilated-conv discriminator
    (espnet2/gan_tts/parallel_wavegan/: 1-d conv stack with growing dilation
    producing a per-sample score map)."""

    layers: int = 6
    channels: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        x = wav[..., None]
        fmaps = []
        for i in range(self.layers):
            x = nn.Conv(self.channels, (5,), kernel_dilation=(2**i,),
                        padding="SAME", dtype=self.dtype, name=f"conv_{i}")(x)
            x = jax.nn.leaky_relu(x, 0.2)
            fmaps.append(x)
        score = nn.Conv(1, (3,), padding="SAME", dtype=self.dtype,
                        name="out")(x)[..., 0]
        return [score], fmaps


def make_vocoder_gan_loss_fns(
    gen,
    disc,
    n_fft: int = 256,
    hop_length: int = 128,
    n_mels: int = 40,
    segment_frames: int = 16,
    lambda_fm: float = 2.0,
    lambda_mel: float = 45.0,
):
    """(g_loss_fn, d_loss_fn) for standalone neural-vocoder training
    (parallel_wavegan/melgan/hifigan recipes): generator consumes the log-mel
    of a random speech segment and reconstructs its waveform adversarially.

    batch: {speech [B, N], speech_lengths, mel [B, T, M], mel_lengths}.
    """

    seg = segment_frames
    hop = hop_length

    def _forward(g_params, batch, rng):
        mel_lengths = batch["mel_lengths"]
        max_start = jnp.maximum(mel_lengths - seg, 0)
        u = jax.random.uniform(rng, (batch["mel"].shape[0],))
        starts = (u * (max_start + 1).astype(jnp.float32)).astype(jnp.int32)
        mel_seg = jax.vmap(
            lambda m, s: jax.lax.dynamic_slice_in_dim(m, s, seg, axis=0)
        )(batch["mel"], starts)
        wav_hat = gen.apply({"params": g_params}, mel_seg)
        wav_real = jax.vmap(
            lambda w, s: jax.lax.dynamic_slice_in_dim(w, s * hop, seg * hop, axis=0)
        )(batch["speech"], starts)
        n = min(wav_hat.shape[1], wav_real.shape[1])
        return wav_hat[:, :n], wav_real[:, :n]

    def g_loss_fn(g_params, d_params, batch, rng):
        wav_hat, wav_real = _forward(g_params, batch, rng)
        fake_scores, fake_fmaps = disc.apply({"params": d_params}, wav_hat)
        _, real_fmaps = disc.apply({"params": d_params}, wav_real)
        adv = lsgan_g_loss(fake_scores)
        fm = feature_matching_loss(real_fmaps, fake_fmaps)
        mel = mel_l1_loss(wav_real, wav_hat, n_fft=n_fft, hop_length=hop,
                          n_mels=n_mels)
        loss = adv + lambda_fm * fm + lambda_mel * mel
        return loss, {"adv": adv, "fm": fm, "mel": mel}

    def d_loss_fn(d_params, g_params, batch, rng):
        wav_hat, wav_real = _forward(g_params, batch, rng)
        wav_hat = jax.lax.stop_gradient(wav_hat)
        real_scores, _ = disc.apply({"params": d_params}, wav_real)
        fake_scores, _ = disc.apply({"params": d_params}, wav_hat)
        loss = lsgan_d_loss(real_scores, fake_scores)
        return loss, {"d": loss}

    return g_loss_fn, d_loss_fn
