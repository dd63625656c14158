"""Singing voice synthesis (espnet2/svs/ rebuild).

Reference families:
  xiaoice/XiaoiceSing.py:38   FastSpeech backbone + musical-score features
      (note pitch + note duration), residual F0 connection to attenuate
      off-key, frame-level log-F0 + V/UV heads, syllable duration loss;
      XiaoiceSing2Loss (xiaoice/loss.py:18) = mel (L1/L2, before+after
      postnet) + duration + pitch MSE + VUV BCE.
  naive_rnn/naive_rnn.py:86   frame-level score features -> embeddings ->
      BiLSTM encoder -> BiLSTM decoder -> mel + postnet; NaiveRNNLoss
      (naive_rnn.py:20) = masked L1 + MSE on both before/after-postnet.
  (singing_tacotron: duration-informed attention GRU variant — the
  Tacotron2 rebuild in models/tacotron2.py covers the attention decoder
  family; not duplicated here.)

TPU-first notes: the syllable duration loss aggregates phoneme durations
over same-note runs with the same one-hot segment-sum used by the uasr join
segmenter (no per-utterance unique_consecutive loops); length regulation is
the static-shape cumsum-searchsorted form from models/tts.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.tts import (
    FastSpeech2,
    FastSpeech2Config,
    VariancePredictor,
    length_regulate,
)
from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


@dataclasses.dataclass(frozen=True)
class SVSConfig:
    tts: FastSpeech2Config = FastSpeech2Config()
    n_midi: int = 129  # 0..127 + rest
    model_type: str = "xiaoice"  # xiaoice | naive_rnn
    # XiaoiceSing loss weights (XiaoiceSing.py lambda_*)
    lambda_mel: float = 1.0
    lambda_dur: float = 0.1
    lambda_pitch: float = 0.01
    lambda_vuv: float = 0.01
    lambda_syllable: float = 0.0  # syllable (same-note) duration loss
    use_postnet: bool = True
    postnet_layers: int = 5
    postnet_chans: int = 256
    postnet_filts: int = 5
    # naive_rnn dims (naive_rnn.py eunits/dunits, bidirectional)
    rnn_units: int = 128
    rnn_elayers: int = 1
    rnn_dlayers: int = 1


class Postnet(nn.Module):
    """Tacotron2-style postnet: conv x N with tanh, residual added to the
    coarse mel (espnet tacotron2/decoder.py Postnet; LayerNorm stands in for
    BatchNorm so inference needs no running stats)."""

    n_mels: int
    layers: int = 5
    chans: int = 256
    filts: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = mel
        for i in range(self.layers):
            last = i == self.layers - 1
            x = nn.Conv(self.n_mels if last else self.chans, (self.filts,),
                        padding="SAME", dtype=self.dtype, name=f"conv{i}")(x)
            if not last:
                x = jnp.tanh(nn.LayerNorm(dtype=self.dtype, name=f"ln{i}")(x))
        return mel + x


def note_segment_sum(values: jnp.ndarray, midi: jnp.ndarray, valid: jnp.ndarray):
    """Sum ``values`` [B, L] over runs of equal ``midi`` notes.

    XiaoiceSing's syllable duration loss accumulates phoneme durations within
    a musical note (XiaoiceSing.py docstring item 3).  Returns
    ([B, L] per-run sums left-packed, [B, L] run-membership mask)."""
    b, L = midi.shape
    boundary = jnp.concatenate(
        [jnp.ones((b, 1), bool), midi[:, 1:] != midi[:, :-1]], axis=1
    )
    boundary = jnp.logical_and(boundary, valid)
    seg_id = jnp.cumsum(boundary.astype(jnp.int32), axis=1) - 1
    n_seg = jnp.maximum(jnp.max(jnp.where(valid, seg_id, -1), axis=1) + 1, 0)
    onehot = jax.nn.one_hot(jnp.where(valid, seg_id, L), L, dtype=values.dtype)
    sums = jnp.einsum("btl,bt->bl", onehot, jnp.where(valid, values, 0.0))
    seg_valid = jnp.arange(L)[None] < n_seg[:, None]
    return sums, seg_valid


def midi_to_log_f0(midi: jnp.ndarray) -> jnp.ndarray:
    """Note id -> log-Hz (A4=69=440 Hz); rest/invalid notes -> 0."""
    f0 = 440.0 * jnp.exp2((midi.astype(jnp.float32) - 69.0) / 12.0)
    return jnp.where((midi > 0) & (midi < 128), jnp.log(f0), 0.0)


class SVSModel(nn.Module):
    """XiaoiceSing-style SVS (XiaoiceSing.py:38): FastSpeech2 backbone with
    learned MIDI-note embeddings added to token encodings, score-driven
    length regulation, frame-level log-F0 (residual from the note pitch) and
    V/UV heads, postnet refinement, XiaoiceSing2 loss."""

    cfg: SVSConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.tts = FastSpeech2(cfg.tts, dtype=self.dtype, name="tts")
        self.midi_embed = nn.Embed(cfg.n_midi, cfg.tts.adim,
                                   dtype=self.dtype, name="midi_embed")
        self.pitch_head = VariancePredictor(cfg.tts.adim, dtype=self.dtype,
                                            name="pitch_head")
        self.vuv_head = VariancePredictor(cfg.tts.adim, dtype=self.dtype,
                                          name="vuv_head")
        if cfg.use_postnet:
            self.postnet = Postnet(
                cfg.tts.n_mels, cfg.postnet_layers, cfg.postnet_chans,
                cfg.postnet_filts, dtype=self.dtype, name="postnet",
            )

    def _encode_score(self, text, text_lengths, midi, deterministic):
        enc, tvalid = self.tts.encode_text(text, text_lengths, deterministic)
        if midi is not None:
            note = self.midi_embed(jnp.clip(midi, 0, self.cfg.n_midi - 1))
            enc = enc + jnp.where(tvalid[..., None], note, 0.0)
        return enc, tvalid

    def _frames(self, enc, tvalid, durations, t_max, deterministic):
        frames, frame_lengths = length_regulate(
            enc, jnp.where(tvalid, durations, 0), t_max
        )
        frame_lengths = jnp.minimum(frame_lengths, t_max)
        # decoder hidden states (before the mel projection) feed the
        # frame-level pitch/vuv heads
        fvalid = make_valid_mask(frame_lengths, t_max)
        x = self.tts.dec_pos(frames, deterministic)
        for layer in self.tts.decoder_layers:
            x = layer(x, fvalid[:, None, :], deterministic)
        mel = jnp.where(fvalid[..., None], self.tts.mel_out(x), 0.0)
        return x, mel, frame_lengths, fvalid

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
        pitch: Optional[jnp.ndarray] = None,  # [B, T] frame log-F0 target
        pitch_lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        cfg = self.cfg
        tcfg = cfg.tts
        enc, tvalid = self._encode_score(text, text_lengths, midi, deterministic)

        # duration predictor on log(d+offset) (fastspeech duration loss)
        d_pred = self.tts.duration_predictor(enc, tvalid, deterministic)
        d_target = jnp.log(jnp.where(tvalid, durations, 0) + tcfg.duration_offset)
        loss_dur = jnp.sum(
            jnp.where(tvalid, (d_pred - d_target) ** 2, 0.0)
        ) / jnp.maximum(jnp.sum(tvalid), 1)

        hidden, mel, frame_lengths, fvalid = self._frames(
            enc, tvalid, durations, speech.shape[1], deterministic
        )
        mvalid = make_valid_mask(speech_lengths, speech.shape[1])[..., None]
        denom = jnp.maximum(jnp.sum(mvalid) * tcfg.n_mels, 1)
        loss_mel = jnp.sum(jnp.where(mvalid, jnp.abs(mel - speech), 0.0)) / denom
        mel_post = None
        if cfg.use_postnet:
            mel_post = self.postnet(mel, deterministic)
            loss_mel = loss_mel + jnp.sum(
                jnp.where(mvalid, jnp.abs(mel_post - speech), 0.0)
            ) / denom

        loss = cfg.lambda_mel * loss_mel + cfg.lambda_dur * loss_dur
        stats = {"loss_mel": loss_mel, "loss_duration": loss_dur}

        # frame-level pitch/VUV (XiaoiceSing2): residual F0 = note pitch
        # expanded to frames + predicted correction
        if pitch is not None and midi is not None:
            note_lf0 = midi_to_log_f0(jnp.where(tvalid, midi, 0))
            frame_note_lf0, _ = length_regulate(
                note_lf0[..., None], jnp.where(tvalid, durations, 0), speech.shape[1]
            )
            p_pred = self.pitch_head(hidden, fvalid, deterministic) + frame_note_lf0[..., 0]
            v_logit = self.vuv_head(hidden, fvalid, deterministic)
            v_target = (pitch > 0).astype(jnp.float32)
            pvalid = jnp.logical_and(fvalid, make_valid_mask(
                pitch_lengths if pitch_lengths is not None else speech_lengths,
                speech.shape[1],
            ))
            # pitch MSE only on voiced frames; VUV BCE on all valid frames
            voiced = jnp.logical_and(pvalid, pitch > 0)
            loss_pitch = jnp.sum(
                jnp.where(voiced, (p_pred - pitch) ** 2, 0.0)
            ) / jnp.maximum(jnp.sum(voiced), 1)
            z = v_logit
            bce = jnp.maximum(z, 0) - z * v_target + jnp.log1p(jnp.exp(-jnp.abs(z)))
            loss_vuv = jnp.sum(jnp.where(pvalid, bce, 0.0)) / jnp.maximum(
                jnp.sum(pvalid), 1
            )
            loss = loss + cfg.lambda_pitch * loss_pitch + cfg.lambda_vuv * loss_vuv
            stats = {**stats, "loss_pitch": loss_pitch, "loss_vuv": loss_vuv}

        # syllable duration loss: predicted per-phone durations summed over
        # same-note runs must match the note length (rhythm enhancement)
        if cfg.lambda_syllable > 0 and midi is not None:
            pred_d = jnp.exp(d_pred) - tcfg.duration_offset
            syl_pred, seg_valid = note_segment_sum(pred_d, midi, tvalid)
            syl_tgt, _ = note_segment_sum(durations.astype(jnp.float32), midi, tvalid)
            loss_syl = jnp.sum(
                jnp.where(seg_valid, (syl_pred - syl_tgt) ** 2, 0.0)
            ) / jnp.maximum(jnp.sum(seg_valid), 1)
            loss = loss + cfg.lambda_syllable * loss_syl
            stats = {**stats, "loss_syllable": loss_syl}

        stats = {"loss": loss, **stats}
        return loss, stats, jnp.asarray(text.shape[0], jnp.float32)

    def inference(self, text, text_lengths, midi, durations, t_max: int = 1000):
        """Score-driven synthesis: durations come from the score, not predicted."""
        enc, tvalid = self._encode_score(text, text_lengths, midi, True)
        hidden, mel, frame_lengths, fvalid = self._frames(
            enc, tvalid, durations, t_max, True
        )
        if self.cfg.use_postnet:
            mel = self.postnet(mel, True)
            mel = jnp.where(fvalid[..., None], mel, 0.0)
        return mel, frame_lengths


class NaiveRNNSVS(nn.Module):
    """naive_rnn.py:86 — frame-level score features through BiLSTM
    encoder/decoder with postnet; NaiveRNNLoss = masked L1+MSE on both
    before- and after-postnet outputs.

    Inputs are PHONE-LEVEL ids + score durations; the expansion to frames
    happens inside via length_regulate (the reference gets frame-level
    features from svs/feats_extract/score_feats_extract.py upstream)."""

    cfg: SVSConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.label_embed = nn.Embed(cfg.tts.vocab_size, cfg.tts.adim,
                                    dtype=self.dtype, name="label_embed")
        self.midi_embed = nn.Embed(cfg.n_midi, cfg.tts.adim,
                                   dtype=self.dtype, name="midi_embed")
        self.enc_rnns = [
            (nn.RNN(nn.OptimizedLSTMCell(cfg.rnn_units), name=f"enc_f{i}"),
             nn.RNN(nn.OptimizedLSTMCell(cfg.rnn_units), reverse=True,
                    keep_order=True, name=f"enc_b{i}"))
            for i in range(cfg.rnn_elayers)
        ]
        self.dec_rnns = [
            (nn.RNN(nn.OptimizedLSTMCell(cfg.rnn_units), name=f"dec_f{i}"),
             nn.RNN(nn.OptimizedLSTMCell(cfg.rnn_units), reverse=True,
                    keep_order=True, name=f"dec_b{i}"))
            for i in range(cfg.rnn_dlayers)
        ]
        self.mel_out = nn.Dense(cfg.tts.n_mels, dtype=self.dtype, name="mel_out")
        self.postnet = Postnet(cfg.tts.n_mels, cfg.postnet_layers,
                               cfg.postnet_chans, cfg.postnet_filts,
                               dtype=self.dtype, name="postnet")

    @staticmethod
    def _bilstm(rnns, x):
        for fwd, bwd in rnns:
            x = jnp.concatenate([fwd(x), bwd(x)], axis=-1)
        return x

    def _synthesize(self, text, text_lengths, midi, durations, t_max,
                    deterministic):
        cfg = self.cfg
        tvalid = make_valid_mask(text_lengths, text.shape[1])
        x = self.label_embed(jnp.clip(text, 0, cfg.tts.vocab_size - 1))
        if midi is not None:
            x = x + self.midi_embed(jnp.clip(midi, 0, cfg.n_midi - 1))
        x = jnp.where(tvalid[..., None], x, 0.0)
        x = self._bilstm(self.enc_rnns, x)
        frames, frame_lengths = length_regulate(
            x, jnp.where(tvalid, durations, 0), t_max
        )
        frame_lengths = jnp.minimum(frame_lengths, t_max)
        h = self._bilstm(self.dec_rnns, frames)
        before = self.mel_out(h)
        fvalid = make_valid_mask(frame_lengths, t_max)[..., None]
        before = jnp.where(fvalid, before, 0.0)
        after = jnp.where(fvalid, self.postnet(before, deterministic), 0.0)
        return before, after, frame_lengths

    def __call__(
        self,
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        speech: jnp.ndarray,
        speech_lengths: jnp.ndarray,
        durations: jnp.ndarray,
        durations_lengths: Optional[jnp.ndarray] = None,
        midi: Optional[jnp.ndarray] = None,
        midi_lengths: Optional[jnp.ndarray] = None,
        pitch: Optional[jnp.ndarray] = None,
        pitch_lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        cfg = self.cfg
        before, after, _ = self._synthesize(
            text, text_lengths, midi, durations, speech.shape[1], deterministic
        )
        mvalid = make_valid_mask(speech_lengths, speech.shape[1])[..., None]
        n = jnp.maximum(jnp.sum(mvalid) * cfg.tts.n_mels, 1)
        l1 = (jnp.sum(jnp.where(mvalid, jnp.abs(before - speech), 0.0))
              + jnp.sum(jnp.where(mvalid, jnp.abs(after - speech), 0.0))) / n
        mse = (jnp.sum(jnp.where(mvalid, (before - speech) ** 2, 0.0))
               + jnp.sum(jnp.where(mvalid, (after - speech) ** 2, 0.0))) / n
        loss = l1 + mse
        stats = {"loss": loss, "loss_mel": l1, "loss_mse": mse,
                 # adapter compatibility: duration loss not modeled here
                 "loss_duration": jnp.asarray(0.0)}
        return loss, stats, jnp.asarray(text.shape[0], jnp.float32)

    def inference(self, text, text_lengths, midi, durations, t_max: int = 1000):
        """Score-driven synthesis (after-postnet output)."""
        _, after, frame_lengths = self._synthesize(
            text, text_lengths, midi, durations, t_max, True
        )
        return after, frame_lengths
