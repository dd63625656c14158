"""JETS: jointly-trained FastSpeech2 + HiFiGAN end-to-end TTS.

Rebuild of espnet2/gan_tts/jets/ (jets.py / generator.py / alignments.py):
- text encoder -> learned text<->mel alignment (AlignmentModule: negative
  L2 distance between projected text and mel frames, monotonic-alignment
  search for the hard path) -> durations, no external duration stream;
- duration predictor trained against the MAS durations; alignment learning
  maximizes the MAS-path likelihood (the reference combines forward-sum +
  Viterbi losses, alignments.py);
- length-regulated decoder predicts mel; a HiFiGAN generator turns a random
  mel segment into waveform, trained adversarially against the real segment
  with the usual LSGAN + feature-matching + mel losses (jets.py loss mix).

Trains through train/gan_trainer.py like gan_tts/gan_codec.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator
from llm_guided_asr_tpu.models.transformer import (
    PositionalEncoding,
    TransformerEncoderLayer,
)
from llm_guided_asr_tpu.models.tts import VariancePredictor, length_regulate
from llm_guided_asr_tpu.ops.monotonic_align import monotonic_align
from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


@dataclasses.dataclass(frozen=True)
class JETSConfig:
    vocab_size: int = 100
    n_mels: int = 40
    adim: int = 128
    heads: int = 2
    eunits: int = 256
    elayers: int = 2
    dlayers: int = 2
    segment_frames: int = 16
    hop_length: int = 128
    n_fft: int = 256
    fs: int = 16000
    duration_offset: float = 1.0
    hifigan: HiFiGANConfig = HiFiGANConfig()


class AlignmentModule(nn.Module):
    """Text/mel pairwise log-likelihood (gan_tts/jets/alignments.py
    AlignmentModule): negative squared distance between projected text keys
    and mel queries, log-softmax over text per frame."""

    adim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h_text, mel, t_valid, m_valid):
        k = nn.Dense(self.adim, dtype=self.dtype, name="key_proj")(
            jax.nn.relu(nn.Dense(self.adim, dtype=self.dtype,
                                 name="key_pre")(h_text))
        )  # [B, L, D]
        q = nn.Dense(self.adim, dtype=self.dtype, name="query_proj")(
            jax.nn.relu(nn.Dense(self.adim, dtype=self.dtype,
                                 name="query_pre")(mel))
        )  # [B, T, D]
        # -||k_l - q_t||^2  -> [B, L, T]
        dist = (
            -jnp.sum(k**2, -1)[:, :, None]
            + 2.0 * jnp.einsum("bld,btd->blt", k, q)
            - jnp.sum(q**2, -1)[:, None, :]
        )
        neg = jnp.asarray(-1e9, dist.dtype)
        dist = jnp.where(t_valid[:, :, None] & m_valid[:, None, :], dist, neg)
        # normalized over text per frame (the forward-sum objective operates
        # on log p(l | t))
        return jax.nn.log_softmax(dist, axis=1)


class JETSGenerator(nn.Module):
    cfg: JETSConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.embed = nn.Embed(cfg.vocab_size, cfg.adim, dtype=self.dtype,
                              name="embed")
        self.enc_pos = PositionalEncoding(0.1, dtype=self.dtype, name="enc_pos")
        self.encoder_layers = [
            TransformerEncoderLayer(cfg.heads, cfg.eunits, 0.1,
                                    dtype=self.dtype, name=f"enc_{i}")
            for i in range(cfg.elayers)
        ]
        self.align = AlignmentModule(cfg.adim, dtype=self.dtype, name="align")
        self.duration_predictor = VariancePredictor(cfg.adim, dtype=self.dtype,
                                                    name="dur")
        self.dec_pos = PositionalEncoding(0.1, dtype=self.dtype, name="dec_pos")
        self.decoder_layers = [
            TransformerEncoderLayer(cfg.heads, cfg.eunits, 0.1,
                                    dtype=self.dtype, name=f"dec_{i}")
            for i in range(cfg.dlayers)
        ]
        self.mel_out = nn.Dense(cfg.n_mels, dtype=self.dtype, name="mel_out")
        # prod(hifigan.upsample_rates) must equal hop_length (frames -> samples)
        self.vocoder = HiFiGANGenerator(cfg.hifigan, name="vocoder")

    def encode_text(self, text, text_lengths, deterministic=True):
        x = self.embed(jnp.clip(text, 0, self.cfg.vocab_size - 1))
        x = self.enc_pos(x, deterministic)
        valid = make_valid_mask(text_lengths, text.shape[1])
        for layer in self.encoder_layers:
            x = layer(x, valid[:, None, :], deterministic)
        return jnp.where(valid[..., None], x, 0.0), valid

    def _decode_mel(self, frames, frame_lengths, deterministic=True):
        t = frames.shape[1]
        valid = jnp.arange(t)[None, :] < frame_lengths[:, None]
        x = self.dec_pos(frames, deterministic)
        for layer in self.decoder_layers:
            x = layer(x, valid[:, None, :], deterministic)
        return jnp.where(valid[..., None], self.mel_out(x), 0.0)

    def __call__(
        self,
        text: jnp.ndarray,  # [B, L]
        text_lengths: jnp.ndarray,
        mel: jnp.ndarray,  # [B, T, n_mels] target log-mel
        mel_lengths: jnp.ndarray,
        seg_rng: jax.Array,
        deterministic: bool = True,
    ):
        """-> (wav_seg_hat, seg_starts, mel_hat, aux losses)."""
        cfg = self.cfg
        h_text, t_valid = self.encode_text(text, text_lengths, deterministic)
        m_valid = make_valid_mask(mel_lengths, mel.shape[1])

        logp = self.align(h_text, mel, t_valid, m_valid)  # [B, L, T]
        attn = jax.lax.stop_gradient(
            monotonic_align(logp, text_lengths, mel_lengths)
        )
        # alignment learning: maximize MAS-path log-likelihood (stands in for
        # the reference's forward-sum + viterbi pair, alignments.py)
        denom = jnp.maximum(jnp.sum(m_valid), 1.0)
        align_loss = -jnp.sum(attn * logp) / denom

        durations = jnp.sum(attn, axis=-1)  # [B, L]
        d_pred = self.duration_predictor(h_text, t_valid, deterministic)
        d_tgt = jnp.log(durations + cfg.duration_offset)
        dur_loss = jnp.sum(
            jnp.where(t_valid, (d_pred - jax.lax.stop_gradient(d_tgt)) ** 2, 0.0)
        ) / jnp.maximum(jnp.sum(t_valid), 1.0)

        frames = jnp.einsum("blt,bld->btd", attn, h_text)  # hard upsampling
        mel_hat = self._decode_mel(frames, mel_lengths, deterministic)
        mel_loss = jnp.sum(
            jnp.where(m_valid[..., None], jnp.abs(mel_hat - mel), 0.0)
        ) / jnp.maximum(jnp.sum(m_valid) * cfg.n_mels, 1.0)

        # random segment -> waveform via HiFiGAN
        seg = cfg.segment_frames
        max_start = jnp.maximum(mel_lengths - seg, 0)
        u = jax.random.uniform(seg_rng, (text.shape[0],))
        starts = (u * (max_start + 1).astype(jnp.float32)).astype(jnp.int32)
        mel_seg = jax.vmap(
            lambda m, s: jax.lax.dynamic_slice_in_dim(m, s, seg, axis=0)
        )(mel_hat, starts)
        wav_hat = self.vocoder(mel_seg)  # [B, seg * hop]
        aux = {"dur": dur_loss, "align": align_loss, "mel_l1": mel_loss}
        return wav_hat, starts, mel_hat, aux

    def inference(
        self, text: jnp.ndarray, text_lengths: jnp.ndarray,
        t_max: int = 400, speed: float = 1.0,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Text -> waveform [B, t_max * hop] with predicted durations."""
        cfg = self.cfg
        h_text, t_valid = self.encode_text(text, text_lengths, True)
        d_pred = self.duration_predictor(h_text, t_valid, True)
        dur = jnp.round(
            (jnp.exp(d_pred) - cfg.duration_offset) / speed
        ).astype(jnp.int32)
        dur = jnp.where(t_valid, jnp.maximum(dur, 1), 0)
        frames, frame_lengths = length_regulate(h_text, dur, t_max)
        n = jnp.minimum(frame_lengths, t_max)
        mel = self._decode_mel(frames, n, True)
        wav = self.vocoder(mel)
        return wav, n * cfg.hop_length


def make_jets_loss_fns(
    gen: JETSGenerator,
    disc,
    cfg: JETSConfig,
    lambda_mel: float = 45.0,
    lambda_fm: float = 2.0,
    lambda_dur: float = 1.0,
    lambda_align: float = 2.0,
):
    """(g_loss_fn, d_loss_fn) for train/gan_trainer.make_gan_steps.

    batch: {text, text_lengths, mel, mel_lengths, speech (waveform)}.
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
        wav_hat, starts, mel_hat, aux = gen.apply(
            {"params": g_params}, batch["text"], batch["text_lengths"],
            batch["mel"], batch["mel_lengths"], rng,
        )
        wav_real = jax.vmap(
            lambda w, s: jax.lax.dynamic_slice_in_dim(w, s * hop, seg * hop,
                                                      axis=0)
        )(batch["speech"], starts)
        return wav_hat, wav_real, aux

    def g_loss_fn(g_params, d_params, batch, rng):
        wav_hat, wav_real, aux = _forward(g_params, batch, rng)
        fake_scores, fake_fmaps = disc.apply({"params": d_params}, wav_hat)
        _, real_fmaps = disc.apply({"params": d_params}, wav_real)
        adv = lsgan_g_loss(fake_scores)
        fm = feature_matching_loss(real_fmaps, fake_fmaps)
        melw = mel_l1_loss(wav_real, wav_hat, n_fft=cfg.n_fft,
                           hop_length=cfg.hop_length, n_mels=cfg.n_mels,
                           fs=cfg.fs)
        loss = (
            adv + lambda_fm * fm + lambda_mel * melw
            + lambda_mel * aux["mel_l1"]
            + lambda_dur * aux["dur"] + lambda_align * aux["align"]
        )
        return loss, {"adv": adv, "fm": fm, "mel": melw, **aux}

    def d_loss_fn(d_params, g_params, batch, rng):
        wav_hat, wav_real, _ = _forward(g_params, batch, rng)
        wav_hat = jax.lax.stop_gradient(wav_hat)
        real_scores, _ = disc.apply({"params": d_params}, wav_real)
        fake_scores, _ = disc.apply({"params": d_params}, wav_hat)
        loss = lsgan_d_loss(real_scores, fake_scores)
        return loss, {"d": loss}

    return g_loss_fn, d_loss_fn
