"""VITS: end-to-end adversarial TTS with a normalizing flow + MAS.

Rebuild of espnet2/gan_tts/vits/ (Kim et al. 2021): text encoder ->
Gaussian prior (m_p, logs_p); posterior encoder over the linear spectrogram
-> z ~ q(z|x); residual-coupling flow f(z) = z_p matched to the prior through
monotonic alignment search (ops/monotonic_align — the Cython
core.pyx TPU port); deterministic duration predictor (the reference's
``use_stochastic_duration_predictor: false`` variant); HiFiGAN decoder on
random z segments; trained adversarially with the multi-scale/period
discriminator through train/gan_trainer.py.

Losses (vits/loss.py): KL(q||p aligned), duration MSE in log domain, mel L1
between sliced real/generated audio, LSGAN adversarial + feature matching.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator
from llm_guided_asr_tpu.models.transformer import (
    PositionalEncoding,
    TransformerEncoderLayer,
)
from llm_guided_asr_tpu.ops.monotonic_align import monotonic_align
from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


@dataclasses.dataclass(frozen=True)
class VITSConfig:
    vocab_size: int = 100
    spec_channels: int = 129  # n_fft // 2 + 1
    hidden: int = 64
    text_layers: int = 2
    text_heads: int = 2
    text_ffn: int = 128
    posterior_layers: int = 3
    flow_layers: int = 2
    flow_conv_layers: int = 2
    segment_frames: int = 16
    n_fft: int = 256
    hop_length: int = 128
    fs: int = 16000
    n_mels: int = 40
    # gan_svs (VISinger, espnet2/gan_svs/vits/): midi-note conditioning added
    # to the text encoder; None = plain TTS
    n_midi: Optional[int] = None
    hifigan: HiFiGANConfig = HiFiGANConfig(
        n_mels=64, channels=64, upsample_rates=(8, 8, 2),
        upsample_kernels=(16, 16, 4), periods=(2, 3), scales=2,
        disc_channels=16,
    )


class VITSTextEncoder(nn.Module):
    cfg: VITSConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, text, text_lengths, deterministic=True, midi=None):
        cfg = self.cfg
        x = nn.Embed(cfg.vocab_size, cfg.hidden, dtype=self.dtype, name="embed")(
            jnp.clip(text, 0, cfg.vocab_size - 1)
        ) * math.sqrt(cfg.hidden)
        if cfg.n_midi is not None and midi is not None:
            # VISinger: note-pitch embedding summed into the phone encoding
            x = x + nn.Embed(cfg.n_midi, cfg.hidden, dtype=self.dtype,
                             name="midi_embed")(jnp.clip(midi, 0, cfg.n_midi - 1))
        x = PositionalEncoding(0.1, dtype=self.dtype, name="pos")(x, deterministic)
        valid = make_valid_mask(text_lengths, text.shape[1])
        for i in range(cfg.text_layers):
            x = TransformerEncoderLayer(
                cfg.text_heads, cfg.text_ffn, 0.1, dtype=self.dtype, name=f"layer_{i}"
            )(x, valid[:, None, :], deterministic)
        stats = nn.Dense(2 * cfg.hidden, dtype=self.dtype, name="proj")(x)
        m_p, logs_p = jnp.split(stats, 2, axis=-1)
        m_p = jnp.where(valid[..., None], m_p, 0.0)
        logs_p = jnp.where(valid[..., None], logs_p, 0.0)
        return x, m_p, logs_p, valid


class PosteriorEncoder(nn.Module):
    cfg: VITSConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, spec, spec_valid):
        cfg = self.cfg
        x = nn.Conv(cfg.hidden, (1,), dtype=self.dtype, name="pre")(spec)
        for i in range(cfg.posterior_layers):
            h = nn.Conv(cfg.hidden, (5,), kernel_dilation=(2**i,), padding="SAME",
                        dtype=self.dtype, name=f"conv_{i}")(x)
            x = x + jax.nn.gelu(nn.LayerNorm(name=f"ln_{i}")(h))
            x = jnp.where(spec_valid[..., None], x, 0.0)
        stats = nn.Conv(2 * cfg.hidden, (1,), dtype=self.dtype, name="proj")(x)
        m_q, logs_q = jnp.split(stats, 2, axis=-1)
        m_q = jnp.where(spec_valid[..., None], m_q, 0.0)
        logs_q = jnp.where(spec_valid[..., None], logs_q, 0.0)
        return m_q, logs_q


class ResidualCouplingLayer(nn.Module):
    """Mean-only affine coupling (vits/flow.py ResidualCouplingLayer,
    mean_only=True -> volume-preserving, logdet 0)."""

    cfg: VITSConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, valid, reverse: bool = False):
        cfg = self.cfg
        half = cfg.hidden // 2
        x0, x1 = z[..., :half], z[..., half:]
        h = nn.Conv(cfg.hidden, (1,), dtype=self.dtype, name="pre")(x0)
        for i in range(cfg.flow_conv_layers):
            g = nn.Conv(cfg.hidden, (5,), kernel_dilation=(2**i,), padding="SAME",
                        dtype=self.dtype, name=f"conv_{i}")(h)
            h = h + jax.nn.gelu(nn.LayerNorm(name=f"ln_{i}")(g))
            h = jnp.where(valid[..., None], h, 0.0)
        m = nn.Conv(cfg.hidden - half, (1,), dtype=self.dtype, name="post")(h)
        x1 = (x1 - m) if reverse else (x1 + m)
        out = jnp.concatenate([x0, x1], axis=-1)
        return jnp.where(valid[..., None], out, 0.0)


class VITSGenerator(nn.Module):
    cfg: VITSConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.text_enc = VITSTextEncoder(cfg, dtype=self.dtype, name="text_enc")
        self.posterior = PosteriorEncoder(cfg, dtype=self.dtype, name="posterior")
        self.flows = [
            ResidualCouplingLayer(cfg, dtype=self.dtype, name=f"flow_{i}")
            for i in range(cfg.flow_layers)
        ]
        hcfg = dataclasses.replace(cfg.hifigan, n_mels=cfg.hidden)
        self.decoder = HiFiGANGenerator(hcfg, dtype=self.dtype, name="decoder")
        self.dur_proj = nn.Dense(1, dtype=self.dtype, name="dur_proj")

    def _flow(self, z, valid, reverse: bool = False):
        flows = self.flows if not reverse else self.flows[::-1]
        for f in flows:
            if not reverse:
                z = f(z, valid)
                z = jnp.flip(z, axis=-1)  # channel flip between couplings
            else:
                z = jnp.flip(z, axis=-1)
                z = f(z, valid, reverse=True)
        return z

    def __call__(
        self,
        text: jnp.ndarray,  # [B, L]
        text_lengths: jnp.ndarray,
        spec: jnp.ndarray,  # [B, T, spec_channels] magnitude spectrogram
        spec_lengths: jnp.ndarray,
        seg_rng: jax.Array,
        midi: Optional[jnp.ndarray] = None,
    ):
        """Training forward -> (wav_seg_hat, seg_start_frames, aux losses)."""
        cfg = self.cfg
        h_text, m_p, logs_p, t_valid = self.text_enc(text, text_lengths, midi=midi)
        s_valid = make_valid_mask(spec_lengths, spec.shape[1])
        m_q, logs_q = self.posterior(spec, s_valid)
        eps = jax.random.normal(jax.random.fold_in(seg_rng, 1), m_q.shape)
        z = m_q + eps * jnp.exp(logs_q)
        z = jnp.where(s_valid[..., None], z, 0.0)
        z_p = self._flow(z, s_valid)

        # MAS over the prior likelihood of z_p (vits.py:monotonic alignment):
        # logN(z_p_t | m_p_l, exp(logs_p_l)) summed over channels
        zp2 = jnp.einsum("btd,bld->blt", z_p**2, jnp.exp(-2.0 * logs_p)) * -0.5
        zpm = jnp.einsum("btd,bld->blt", z_p, m_p * jnp.exp(-2.0 * logs_p))
        const = jnp.sum(
            -0.5 * (m_p**2) * jnp.exp(-2.0 * logs_p) - logs_p
            - 0.5 * math.log(2 * math.pi),
            axis=-1,
        )  # [B, L]
        value = zp2 + zpm + const[:, :, None]  # [B, L, T]
        attn = jax.lax.stop_gradient(
            monotonic_align(value, text_lengths, spec_lengths)
        )  # [B, L, T]

        durations = jnp.sum(attn, axis=-1)  # [B, L]
        log_dur_pred = self.dur_proj(jax.lax.stop_gradient(h_text))[..., 0]
        log_dur_tgt = jnp.log(durations + 1.0)
        dur_loss = jnp.sum(
            jnp.where(t_valid, (log_dur_pred - log_dur_tgt) ** 2, 0.0)
        ) / jnp.maximum(jnp.sum(t_valid), 1.0)

        # expand prior to frames through the alignment
        m_p_t = jnp.einsum("blt,bld->btd", attn, m_p)
        logs_p_t = jnp.einsum("blt,bld->btd", attn, logs_p)
        # KL(q(z|x) || p(z|text)) evaluated on z_p (vits/loss.py kl_loss)
        kl = logs_p_t - logs_q - 0.5 + 0.5 * (
            (z_p - m_p_t) ** 2
        ) * jnp.exp(-2.0 * logs_p_t)
        denom = jnp.maximum(jnp.sum(s_valid) * cfg.hidden, 1.0)
        kl_loss = jnp.sum(jnp.where(s_valid[..., None], kl, 0.0)) / denom

        # random segment slice for the waveform decoder
        seg = cfg.segment_frames
        max_start = jnp.maximum(spec_lengths - seg, 0)
        u = jax.random.uniform(jax.random.fold_in(seg_rng, 2), (text.shape[0],))
        starts = (u * (max_start + 1).astype(jnp.float32)).astype(jnp.int32)
        z_seg = jax.vmap(
            lambda zz, s: jax.lax.dynamic_slice_in_dim(zz, s, seg, axis=0)
        )(z, starts)
        wav_hat = self.decoder(z_seg)  # [B, seg * hop]
        return wav_hat, starts, {"kl": kl_loss, "dur": dur_loss}

    def inference(
        self, text: jnp.ndarray, text_lengths: jnp.ndarray,
        noise_scale: float = 0.667, max_frames: int = 400,
        rng: Optional[jax.Array] = None, midi: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """text -> (waveform [B, N], frame lengths)."""
        from llm_guided_asr_tpu.models.tts import length_regulate

        cfg = self.cfg
        h_text, m_p, logs_p, t_valid = self.text_enc(text, text_lengths, True, midi=midi)
        log_dur = self.dur_proj(h_text)[..., 0]
        durations = jnp.where(
            t_valid, jnp.round(jnp.exp(log_dur) - 1.0), 0.0
        ).astype(jnp.int32)
        durations = jnp.maximum(durations, jnp.where(t_valid, 1, 0))
        m_p_t, frame_lengths = length_regulate(m_p, durations, max_frames)
        logs_p_t, _ = length_regulate(logs_p, durations, max_frames)
        s_valid = make_valid_mask(frame_lengths, max_frames)
        noise = (
            jax.random.normal(rng if rng is not None else jax.random.PRNGKey(0),
                              m_p_t.shape)
            * noise_scale
        )
        z_p = m_p_t + noise * jnp.exp(logs_p_t)
        z_p = jnp.where(s_valid[..., None], z_p, 0.0)
        z = self._flow(z_p, s_valid, reverse=True)
        wav = self.decoder(z)
        return wav, frame_lengths


def make_vits_loss_fns(
    gen: VITSGenerator,
    disc,
    cfg: VITSConfig,
    lambda_kl: float = 1.0,
    lambda_dur: float = 1.0,
    lambda_mel: float = 45.0,
    lambda_fm: float = 2.0,
):
    """(g_loss_fn, d_loss_fn) for train/gan_trainer.make_gan_steps.

    batch: {text, text_lengths, spec, spec_lengths, speech (waveform)}.
    """
    from llm_guided_asr_tpu.models.hifigan import (
        feature_matching_loss,
        lsgan_d_loss,
        lsgan_g_loss,
        mel_l1_loss,
    )

    hop = cfg.hop_length
    seg = cfg.segment_frames

    def _forward(g_params, batch, rng):
        wav_hat, starts, aux = gen.apply(
            {"params": g_params}, batch["text"], batch["text_lengths"],
            batch["spec"], batch["spec_lengths"], rng,
            midi=batch.get("midi"),
        )
        wav_real = jax.vmap(
            lambda w, s: jax.lax.dynamic_slice_in_dim(w, s * hop, seg * hop, axis=0)
        )(batch["speech"], starts)
        return wav_hat, wav_real, aux

    def g_loss_fn(g_params, d_params, batch, rng):
        wav_hat, wav_real, aux = _forward(g_params, batch, rng)
        fake_scores, fake_fmaps = disc.apply({"params": d_params}, wav_hat)
        _, real_fmaps = disc.apply({"params": d_params}, wav_real)
        adv = lsgan_g_loss(fake_scores)
        fm = feature_matching_loss(real_fmaps, fake_fmaps)
        mel = mel_l1_loss(wav_real, wav_hat, n_fft=cfg.n_fft,
                          hop_length=cfg.hop_length, n_mels=cfg.n_mels, fs=cfg.fs)
        loss = (
            adv + lambda_fm * fm + lambda_mel * mel
            + lambda_kl * aux["kl"] + lambda_dur * aux["dur"]
        )
        return loss, {"adv": adv, "fm": fm, "mel": mel, **aux}

    def d_loss_fn(d_params, g_params, batch, rng):
        wav_hat, wav_real, _ = _forward(g_params, batch, rng)
        wav_hat = jax.lax.stop_gradient(wav_hat)
        real_scores, _ = disc.apply({"params": d_params}, wav_real)
        fake_scores, _ = disc.apply({"params": d_params}, wav_hat)
        loss = lsgan_d_loss(real_scores, fake_scores)
        return loss, {"d": loss}

    return g_loss_fn, d_loss_fn
