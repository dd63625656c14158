"""Singing voice synthesis (espnet2/svs/ rebuild, minimal-but-real).

SVS differs from TTS by conditioning on the musical score: per-phoneme MIDI
note and note-duration streams (svs/espnet_model.py naive_rnn/xiaoice
models).  Here: the FastSpeech2 backbone plus learned MIDI-note embeddings
added to the encoder output before the variance adaptor; durations follow the
score.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.tts import FastSpeech2, FastSpeech2Config, length_regulate
from llm_guided_asr_tpu.ops.losses import accuracy
from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


@dataclasses.dataclass(frozen=True)
class SVSConfig:
    tts: FastSpeech2Config = FastSpeech2Config()
    n_midi: int = 129  # 0..127 + rest


class SVSModel(nn.Module):
    cfg: SVSConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        self.tts = FastSpeech2(self.cfg.tts, dtype=self.dtype, name="tts")
        self.midi_embed = nn.Embed(self.cfg.n_midi, self.cfg.tts.adim,
                                   dtype=self.dtype, name="midi_embed")

    def __call__(
        self,
        text: jnp.ndarray,  # [B, L] phoneme ids, padded -1
        text_lengths: jnp.ndarray,
        speech: jnp.ndarray,  # [B, T, n_mels] target log-mel
        speech_lengths: jnp.ndarray,
        durations: jnp.ndarray,  # [B, L] frames per phoneme (from the score)
        durations_lengths: Optional[jnp.ndarray] = None,
        midi: Optional[jnp.ndarray] = None,  # [B, L] note ids
        midi_lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        cfg = self.cfg.tts
        enc, tvalid = self.tts.encode_text(text, text_lengths, deterministic)
        if midi is not None:
            note = self.midi_embed(jnp.clip(midi, 0, self.cfg.n_midi - 1))
            enc = enc + jnp.where(tvalid[..., None], note, 0.0)

        d_pred = self.tts.duration_predictor(enc, tvalid, deterministic)
        d_target = jnp.log(jnp.where(tvalid, durations, 0) + cfg.duration_offset)
        loss_dur = jnp.sum(
            jnp.where(tvalid, (d_pred - d_target) ** 2, 0.0)
        ) / jnp.maximum(jnp.sum(tvalid), 1)

        frames, frame_lengths = length_regulate(
            enc, jnp.where(tvalid, durations, 0), speech.shape[1]
        )
        mel = self.tts._decode(
            frames, jnp.minimum(frame_lengths, speech.shape[1]), deterministic
        )
        mvalid = make_valid_mask(speech_lengths, speech.shape[1])[..., None]
        loss_mel = jnp.sum(jnp.where(mvalid, jnp.abs(mel - speech), 0.0)) / jnp.maximum(
            jnp.sum(mvalid) * cfg.n_mels, 1
        )
        loss = loss_mel + loss_dur
        stats = {"loss": loss, "loss_mel": loss_mel, "loss_duration": loss_dur}
        return loss, stats, jnp.asarray(text.shape[0], jnp.float32)

    def inference(self, text, text_lengths, midi, durations, t_max: int = 1000):
        """Score-driven synthesis: durations come from the score, not predicted."""
        enc, tvalid = self.tts.encode_text(text, text_lengths, True)
        note = self.midi_embed(jnp.clip(midi, 0, self.cfg.n_midi - 1))
        enc = enc + jnp.where(tvalid[..., None], note, 0.0)
        frames, frame_lengths = length_regulate(
            enc, jnp.where(tvalid, durations, 0), t_max
        )
        mel = self.tts._decode(frames, jnp.minimum(frame_lengths, t_max), True)
        return mel, jnp.minimum(frame_lengths, t_max)
