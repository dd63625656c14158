"""Neural audio codec: conv encoder + residual VQ + conv decoder.

Rebuild of espnet2/gan_codec/ (SoundStream/Encodec family) at the
reconstruction-training level: strided conv encoder to a low-rate latent,
a residual vector quantizer (straight-through estimator + EMA-free commitment
/codebook losses), and a transposed-conv decoder; losses = time L1 + mel L1 +
VQ terms.  The adversarial discriminators from models/hifigan.py plug in via
train/gan_trainer.py for GAN fine-tuning (gan_codec trains the same way).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


@dataclasses.dataclass(frozen=True)
class CodecConfig:
    channels: int = 64
    latent_dim: int = 64
    strides: Tuple[int, ...] = (4, 4, 8)  # prod = samples per code frame
    n_quantizers: int = 4
    codebook_size: int = 256
    commitment_weight: float = 0.25


class ResidualVQ(nn.Module):
    """Residual vector quantizer with straight-through gradients."""

    n_quantizers: int
    codebook_size: int
    dim: int

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """[B, T, D] -> (quantized, codes [B, T, Q], vq_loss)."""
        residual = z
        quantized = jnp.zeros_like(z)
        codes = []
        loss = 0.0
        for qi in range(self.n_quantizers):
            book = self.param(
                f"codebook_{qi}", nn.initializers.normal(1.0),
                (self.codebook_size, self.dim),
            )
            d = (
                jnp.sum(residual**2, -1, keepdims=True)
                - 2 * residual @ book.T
                + jnp.sum(book**2, -1)[None, None, :]
            )
            idx = jnp.argmin(d, axis=-1)  # [B, T]
            q = book[idx]
            # codebook loss pulls codes to encodings; commitment the reverse
            loss = loss + jnp.mean((jax.lax.stop_gradient(residual) - q) ** 2)
            loss = loss + 0.25 * jnp.mean((residual - jax.lax.stop_gradient(q)) ** 2)
            # straight-through
            q = residual + jax.lax.stop_gradient(q - residual)
            quantized = quantized + q
            residual = residual - q
            codes.append(idx)
        return quantized, jnp.stack(codes, axis=-1), loss / self.n_quantizers


class CodecModel(nn.Module):
    cfg: CodecConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.rvq = ResidualVQ(cfg.n_quantizers, cfg.codebook_size, cfg.latent_dim,
                              name="rvq")
        ch = cfg.channels
        enc = []
        for i, s in enumerate(cfg.strides):
            enc.append(nn.Conv(ch, (2 * s,), strides=(s,), padding="SAME",
                               dtype=self.dtype, name=f"enc_{i}"))
            ch = min(ch * 2, 256)
        self.enc_convs = enc
        self.enc_out = nn.Conv(cfg.latent_dim, (3,), padding="SAME",
                               dtype=self.dtype, name="enc_out")
        self.dec_in = nn.Conv(cfg.channels * 2, (3,), padding="SAME",
                              dtype=self.dtype, name="dec_in")
        self.dec_convs = [
            nn.ConvTranspose(max(cfg.channels // (2**i), 16), (2 * s,),
                             strides=(s,), padding="SAME", dtype=self.dtype,
                             name=f"dec_{i}")
            for i, s in enumerate(reversed(cfg.strides))
        ]
        self.dec_out = nn.Conv(1, (7,), padding="SAME", dtype=self.dtype,
                               name="dec_out")

    def _encode_conv(self, x):
        h = x[..., None]
        for conv in self.enc_convs:
            h = jax.nn.elu(conv(h))
        return self.enc_out(h)

    def _decode_conv(self, z):
        h = self.dec_in(z)
        for conv in self.dec_convs:
            h = conv(jax.nn.elu(h))
        return jnp.tanh(self.dec_out(h))[..., 0]

    def encode(self, speech: jnp.ndarray):
        """[B, N] -> codes [B, T, Q] (the discrete bitstream)."""
        z = self._encode_conv(speech)
        _, codes, _ = self.rvq(z)
        return codes

    def decode_codes(self, codes: jnp.ndarray):
        """codes [B, T, Q] -> waveform, via codebook lookups."""
        q = jnp.zeros(codes.shape[:2] + (self.cfg.latent_dim,))
        for qi in range(self.cfg.n_quantizers):
            book = self.variables["params"]["rvq"][f"codebook_{qi}"]
            q = q + book[codes[..., qi]]
        return self._decode_conv(q.astype(self.dtype))

    def reconstruct(self, speech: jnp.ndarray):
        """[B, N] -> (recon [B, N'], vq_loss) — the GAN generator forward."""
        z = self._encode_conv(speech)
        q, _, vq_loss = self.rvq(z)
        return self._decode_conv(q), vq_loss

    def __call__(
        self, speech: jnp.ndarray, speech_lengths=None, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        from llm_guided_asr_tpu.models.hifigan import mel_l1_loss

        z = self._encode_conv(speech)
        q, codes, vq_loss = self.rvq(z)
        recon = self._decode_conv(q)
        n = min(recon.shape[1], speech.shape[1])
        l1 = jnp.mean(jnp.abs(recon[:, :n] - speech[:, :n]))
        mel = mel_l1_loss(speech[:, :n], recon[:, :n], n_fft=256, hop_length=128,
                          n_mels=40)
        loss = l1 + mel + self.cfg.commitment_weight * vq_loss
        stats = {"loss": loss, "l1": l1, "mel_l1": mel, "vq": vq_loss}
        return loss, stats, jnp.asarray(speech.shape[0], jnp.float32)


def make_codec_gan_loss_fns(
    codec: CodecModel,
    disc,
    lambda_fm: float = 2.0,
    lambda_mel: float = 45.0,
    lambda_l1: float = 1.0,
):
    """(g_loss_fn, d_loss_fn) for train/gan_trainer.make_gan_steps.

    The gan_codec training phase (espnet2/gan_codec/: SoundStream/Encodec-style
    adversarial fine-tune): generator = encoder+RVQ+decoder reconstruction,
    discriminator = HiFiGAN multi-scale/period stack; generator loss adds
    LSGAN adversarial + feature-matching terms to the reconstruction + VQ
    objective.  batch: {speech [B, N], speech_lengths}.
    """
    from llm_guided_asr_tpu.models.hifigan import (
        feature_matching_loss,
        lsgan_d_loss,
        lsgan_g_loss,
        mel_l1_loss,
    )

    def _forward(g_params, batch):
        recon, vq_loss = codec.apply(
            {"params": g_params}, batch["speech"], method=codec.reconstruct
        )
        n = min(recon.shape[1], batch["speech"].shape[1])
        return recon[:, :n], batch["speech"][:, :n], vq_loss

    def g_loss_fn(g_params, d_params, batch, rng):
        wav_hat, wav_real, vq_loss = _forward(g_params, batch)
        fake_scores, fake_fmaps = disc.apply({"params": d_params}, wav_hat)
        _, real_fmaps = disc.apply({"params": d_params}, wav_real)
        adv = lsgan_g_loss(fake_scores)
        fm = feature_matching_loss(real_fmaps, fake_fmaps)
        l1 = jnp.mean(jnp.abs(wav_hat - wav_real))
        mel = mel_l1_loss(wav_real, wav_hat, n_fft=256, hop_length=128, n_mels=40)
        loss = (
            adv + lambda_fm * fm + lambda_mel * mel + lambda_l1 * l1
            + codec.cfg.commitment_weight * vq_loss
        )
        return loss, {"adv": adv, "fm": fm, "mel": mel, "l1": l1, "vq": vq_loss}

    def d_loss_fn(d_params, g_params, batch, rng):
        wav_hat, wav_real, _ = _forward(g_params, batch)
        wav_hat = jax.lax.stop_gradient(wav_hat)
        real_scores, _ = disc.apply({"params": d_params}, wav_real)
        fake_scores, _ = disc.apply({"params": d_params}, wav_hat)
        loss = lsgan_d_loss(real_scores, fake_scores)
        return loss, {"d": loss}

    return g_loss_fn, d_loss_fn
