"""Discrete-unit TTS (espnet2/tts2/ rebuild).

tts2 replaces the mel target with discrete speech units (codec codes or
HuBERT k-means).  Two model families, as in the reference:

- ``TTS2Model``: text encoder -> attention decoder over the unit vocabulary,
  label-smoothed CE; synthesis = greedy/beam unit generation + codec
  decode_codes (or a unit vocoder).  Reuses the MT-style encoder and the
  shared TransformerDecoder, so the on-device beam search applies to unit
  generation.
- ``FastSpeech2Discrete``: non-autoregressive FastSpeech2 with a discrete
  output head (espnet2/tts2/fastspeech2/fastspeech2_discrete.py): text
  encoder -> variance adaptor (duration/pitch/energy) -> length regulator ->
  decoder -> CE over unit ids per frame (optionally ``discrete_token_layers``
  parallel codebooks), losses per
  espnet2/tts2/fastspeech2/loss.py FastSpeech2LossDiscrete (CE + duration
  log-MSE + pitch/energy MSE, mask-reduced).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.transformer import PositionalEncoding, TransformerEncoderLayer
from llm_guided_asr_tpu.models.transformer_decoder import (
    TransformerDecoder,
    TransformerDecoderConfig,
)
from llm_guided_asr_tpu.ops.losses import accuracy, add_sos_eos, label_smoothing_loss
from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


@dataclasses.dataclass(frozen=True)
class TTS2Config:
    vocab_size: int = 100  # text vocab
    unit_vocab_size: int = 256  # discrete speech units (+1 sos/eos appended)
    adim: int = 128
    heads: int = 2
    units: int = 256
    elayers: int = 2
    decoder: TransformerDecoderConfig = TransformerDecoderConfig()
    lsm_weight: float = 0.1

    @property
    def unit_sos(self) -> int:
        return self.unit_vocab_size

    # beam-search interface parity
    @property
    def sos_id(self) -> int:
        return self.unit_sos

    @property
    def eos_id(self) -> int:
        return self.unit_sos

    @property
    def blank_id(self) -> int:
        return 0


class TTS2Model(nn.Module):
    cfg: TTS2Config
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.embed = nn.Embed(cfg.vocab_size, cfg.adim, dtype=self.dtype, name="embed")
        self.pos = PositionalEncoding(0.1, dtype=self.dtype, name="pos")
        self.blocks = [
            TransformerEncoderLayer(cfg.heads, cfg.units, 0.1, dtype=self.dtype,
                                    name=f"block_{i}")
            for i in range(cfg.elayers)
        ]
        self.after_norm = nn.LayerNorm(dtype=self.dtype, name="after_norm")
        self.unit_decoder = TransformerDecoder(
            cfg.unit_vocab_size + 1, cfg.decoder, dtype=self.dtype, name="unit_decoder"
        )

    def encode(self, text, text_lengths, deterministic: bool = True):
        valid = make_valid_mask(text_lengths, text.shape[1])
        x = self.embed(jnp.where(valid, text, 0))
        x = self.pos(x, deterministic)
        for blk in self.blocks:
            x = blk(x, valid[:, None, :], deterministic)
        x = self.after_norm(x)
        return jnp.where(valid[..., None], x, 0.0), text_lengths

    def decoder_logits(self, enc, enc_lens, ys_in, ys_in_lengths,
                       deterministic: bool = True, only_last: bool = False):
        return self.unit_decoder(enc, enc_lens, ys_in, ys_in_lengths, deterministic,
                                 only_last=only_last)

    def __call__(
        self,
        text: jnp.ndarray,  # [B, L] text ids, padded -1
        text_lengths: jnp.ndarray,
        units: jnp.ndarray,  # [B, U] target unit ids, padded -1
        units_lengths: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        cfg = self.cfg
        valid = make_valid_mask(text_lengths, text.shape[1])
        enc, enc_lens = self.encode(jnp.where(valid, text, 0), text_lengths,
                                    deterministic)
        u_in, u_out = add_sos_eos(units, units_lengths, cfg.unit_sos, cfg.unit_sos, -1)
        logits = self.unit_decoder(enc, enc_lens, u_in, units_lengths + 1, deterministic)
        loss = label_smoothing_loss(logits, u_out, cfg.lsm_weight, -1)
        stats = {"loss": loss, "acc": accuracy(logits, u_out, -1)}
        return loss, stats, jnp.asarray(text.shape[0], jnp.float32)


@dataclasses.dataclass(frozen=True)
class FastSpeech2DiscreteConfig:
    """fastspeech2_discrete.py __init__ surface (the subset that changes
    math; structural dims collapse into the shared encoder blocks)."""

    vocab_size: int = 100       # idim (text tokens)
    unit_vocab_size: int = 256  # odim (discrete speech units)
    adim: int = 128
    heads: int = 2
    eunits: int = 256
    elayers: int = 2
    dlayers: int = 2
    duration_offset: float = 1.0   # log(d + offset) regression target
    pitch_embed_kernel_size: int = 9
    energy_embed_kernel_size: int = 9
    stop_gradient_from_pitch_predictor: bool = False
    stop_gradient_from_energy_predictor: bool = False
    # parallel codebooks (fastspeech2_discrete.py discrete_token_layers):
    # targets arrive layer-interleaved on the unit stream; the head emits
    # [B, T, layers, V]
    discrete_token_layers: int = 1
    ignore_id: int = -1


class FastSpeech2Discrete(nn.Module):
    """Non-AR discrete-unit FastSpeech2 (fastspeech2_discrete.py:32)."""

    cfg: FastSpeech2DiscreteConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        from llm_guided_asr_tpu.models.tts import VariancePredictor

        cfg = self.cfg
        self.embed = nn.Embed(cfg.vocab_size, cfg.adim, dtype=self.dtype,
                              name="embed")
        self.enc_pos = PositionalEncoding(0.1, dtype=self.dtype, name="enc_pos")
        self.encoder_layers = [
            TransformerEncoderLayer(cfg.heads, cfg.eunits, 0.1,
                                    dtype=self.dtype, name=f"enc_{i}")
            for i in range(cfg.elayers)
        ]
        self.duration_predictor = VariancePredictor(cfg.adim, dtype=self.dtype,
                                                    name="dur")
        self.pitch_predictor = VariancePredictor(cfg.adim, dtype=self.dtype,
                                                 name="pitch")
        self.energy_predictor = VariancePredictor(cfg.adim, dtype=self.dtype,
                                                  name="energy")
        # reference embeds the *target* scalar through a kernel-9 conv
        # (pitch_embed_kernel_size), not a pointwise dense
        self.pitch_embed = nn.Conv(cfg.adim, (cfg.pitch_embed_kernel_size,),
                                   padding="SAME", dtype=self.dtype,
                                   name="pitch_embed")
        self.energy_embed = nn.Conv(cfg.adim, (cfg.energy_embed_kernel_size,),
                                    padding="SAME", dtype=self.dtype,
                                    name="energy_embed")
        self.dec_pos = PositionalEncoding(0.1, dtype=self.dtype, name="dec_pos")
        self.decoder_layers = [
            TransformerEncoderLayer(cfg.heads, cfg.eunits, 0.1,
                                    dtype=self.dtype, name=f"dec_{i}")
            for i in range(cfg.dlayers)
        ]
        self.unit_out = nn.Dense(
            cfg.unit_vocab_size * cfg.discrete_token_layers,
            dtype=self.dtype, name="unit_out",
        )

    def _encode_text(self, text, text_lengths, deterministic):
        valid = make_valid_mask(text_lengths, text.shape[1])
        x = self.embed(jnp.where(valid, text, 0))
        x = self.enc_pos(x, deterministic)
        for layer in self.encoder_layers:
            x = layer(x, valid[:, None, :], deterministic)
        return jnp.where(valid[..., None], x, 0.0), valid

    def _decode_units(self, frames, frame_lengths, deterministic):
        cfg = self.cfg
        t = frames.shape[1]
        valid = jnp.arange(t)[None, :] < frame_lengths[:, None]
        x = self.dec_pos(frames, deterministic)
        for layer in self.decoder_layers:
            x = layer(x, valid[:, None, :], deterministic)
        logits = self.unit_out(x)  # [B, T, layers*V]
        if cfg.discrete_token_layers > 1:
            logits = logits.reshape(
                logits.shape[0], t, cfg.discrete_token_layers,
                cfg.unit_vocab_size,
            )
        return logits, valid

    def __call__(
        self,
        text: jnp.ndarray,             # [B, L] text ids, padded -1
        text_lengths: jnp.ndarray,
        units: jnp.ndarray,            # [B, T(*layers)] target unit ids
        units_lengths: jnp.ndarray,
        durations: jnp.ndarray,        # [B, L] frames per token
        durations_lengths: Optional[jnp.ndarray] = None,
        pitch: Optional[jnp.ndarray] = None,   # [B, L] token-averaged
        energy: Optional[jnp.ndarray] = None,  # [B, L]
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        from llm_guided_asr_tpu.models.tts import length_regulate

        cfg = self.cfg
        enc, tvalid = self._encode_text(text, text_lengths, deterministic)
        durations = jnp.where(tvalid, durations, 0)

        # variance adaptor (reference forward: predictors see the encoder
        # output, optionally detached; TRAINING embeds ground-truth p/e)
        d_pred = self.duration_predictor(enc, tvalid, deterministic)
        d_target = jnp.log(durations.astype(jnp.float32) + cfg.duration_offset)
        n_tok = jnp.maximum(jnp.sum(tvalid), 1)
        loss_dur = jnp.sum(
            jnp.where(tvalid, (d_pred - d_target) ** 2, 0.0)) / n_tok

        h = enc
        stats: Dict[str, jnp.ndarray] = {"duration_loss": loss_dur}
        loss = loss_dur
        # predictors always run (the reference constructs and calls them
        # unconditionally); loss + ground-truth embedding only when the
        # pitch/energy streams are present in the corpus
        p_src = jax.lax.stop_gradient(enc) if \
            cfg.stop_gradient_from_pitch_predictor else enc
        p_pred = self.pitch_predictor(p_src, tvalid, deterministic)
        e_src = jax.lax.stop_gradient(enc) if \
            cfg.stop_gradient_from_energy_predictor else enc
        e_pred = self.energy_predictor(e_src, tvalid, deterministic)
        if pitch is not None:
            loss_p = jnp.sum(
                jnp.where(tvalid, (p_pred - pitch) ** 2, 0.0)) / n_tok
            stats["pitch_loss"] = loss_p
            loss = loss + loss_p
            h = h + self.pitch_embed(pitch[..., None])
        else:
            h = h + self.pitch_embed(p_pred[..., None])
        if energy is not None:
            loss_e = jnp.sum(
                jnp.where(tvalid, (e_pred - energy) ** 2, 0.0)) / n_tok
            stats["energy_loss"] = loss_e
            loss = loss + loss_e
            h = h + self.energy_embed(energy[..., None])
        else:
            h = h + self.energy_embed(e_pred[..., None])
        h = jnp.where(tvalid[..., None], h, 0.0)

        # length regulate to the unit-frame axis and classify each frame
        layers = cfg.discrete_token_layers
        if layers > 1:
            # unit stream is layer-interleaved [u0l0 u0l1 ... u1l0 ...]
            t_frames = units.shape[1] // layers
            tgt = units[:, : t_frames * layers].reshape(-1, t_frames, layers)
            olens = units_lengths // layers
        else:
            t_frames = units.shape[1]
            tgt = units
            olens = units_lengths
        frames, frame_lengths = length_regulate(h, durations, t_frames)
        logits, _ = self._decode_units(frames, olens, deterministic)

        ovalid = jnp.arange(t_frames)[None, :] < olens[:, None]
        tgt_valid = ovalid[..., None] & (tgt >= 0) if layers > 1 else \
            ovalid & (tgt >= 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(
            logp, jnp.maximum(tgt, 0)[..., None], axis=-1)[..., 0]
        n_out = jnp.maximum(jnp.sum(tgt_valid), 1)
        ce = jnp.sum(jnp.where(tgt_valid, nll, 0.0)) / n_out
        acc = jnp.sum(
            jnp.where(tgt_valid, jnp.argmax(logits, -1) == tgt, False)) / n_out
        loss = loss + ce
        stats.update({"l1_loss": ce, "acc": acc, "loss": loss})
        return loss, stats, jnp.asarray(text.shape[0], jnp.float32)

    def inference(
        self, text: jnp.ndarray, text_lengths: jnp.ndarray, t_max: int = 500,
        speed: float = 1.0,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Predict unit ids [B, t_max(, layers)] + frame lengths from text."""
        from llm_guided_asr_tpu.models.tts import length_regulate

        cfg = self.cfg
        enc, tvalid = self._encode_text(text, text_lengths, True)
        d_pred = self.duration_predictor(enc, tvalid, True)
        dur = jnp.round(
            (jnp.exp(d_pred) - cfg.duration_offset) / speed).astype(jnp.int32)
        dur = jnp.where(tvalid, jnp.maximum(dur, 1), 0)
        p_pred = self.pitch_predictor(enc, tvalid, True)
        e_pred = self.energy_predictor(enc, tvalid, True)
        h = enc + self.pitch_embed(p_pred[..., None]) \
            + self.energy_embed(e_pred[..., None])
        h = jnp.where(tvalid[..., None], h, 0.0)
        frames, frame_lengths = length_regulate(h, dur, t_max)
        frame_lengths = jnp.minimum(frame_lengths, t_max)
        logits, _ = self._decode_units(frames, frame_lengths, True)
        return jnp.argmax(logits, -1), frame_lengths
