"""Spoken language understanding (espnet2/slu/ rebuild).

The reference SLU task (espnet2/slu/espnet_model.py:35 ESPnetSLUModel) is
ASR with the semantic annotation serialized into the transcript, plus:
  - a *postdecoder* encoding the ground-truth/first-pass transcript
    (slu/postdecoder/hugging_face_transformers_postdecoder.py — frozen
    BERT; here a trainable transformer transcript encoder, since a torch
    BERT cannot live inside a jitted train step; HF-BERT weight ingestion
    can be layered on later like the wav2vec2/HuBERT encoders)
  - a *deliberation encoder* fusing acoustic encoder states with the
    transcript states (slu/postencoder/{transformer,conformer}_postencoder
    .py — cross-attention blocks) before the decoder
plus an utterance-level intent head; loss = asr_loss + intent CE.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.asr_model import ASRModel, ASRModelConfig
from llm_guided_asr_tpu.models.transformer import (
    LayerNorm,
    MultiHeadedAttention,
    PositionwiseFeedForward,
)
from llm_guided_asr_tpu.ops.losses import accuracy
from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


@dataclasses.dataclass(frozen=True)
class SLUConfig:
    asr: ASRModelConfig = None
    n_intents: int = 10
    intent_weight: float = 0.3
    # transcript conditioning (postdecoder + deliberation encoder)
    use_transcript: bool = False
    transcript_vocab_size: int = 0  # 0 -> reuse asr vocab
    transcript_layers: int = 2
    deliberation_layers: int = 1
    transcript_heads: int = 2
    transcript_ffn: int = 256


class TranscriptEncoder(nn.Module):
    """Postdecoder analog (hugging_face_transformers_postdecoder.py:21):
    encodes the transcript token sequence into contextual states."""

    vocab_size: int
    d_model: int
    layers: int
    heads: int
    ffn: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ids, lengths, deterministic=True):
        x = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype,
                     name="embed")(jnp.clip(ids, 0, self.vocab_size - 1))
        valid = make_valid_mask(lengths, ids.shape[1])
        x = jnp.where(valid[..., None], x, 0.0)
        mask = valid[:, None, :]
        for i in range(self.layers):
            h = LayerNorm(dtype=self.dtype, name=f"ln1_{i}")(x)
            x = x + MultiHeadedAttention(
                self.heads, 0.0, dtype=self.dtype, name=f"attn_{i}"
            )(h, h, h, mask, deterministic)
            h = LayerNorm(dtype=self.dtype, name=f"ln2_{i}")(x)
            x = x + PositionwiseFeedForward(
                self.ffn, 0.0, dtype=self.dtype, name=f"ffn_{i}"
            )(h, deterministic)
        return LayerNorm(dtype=self.dtype, name="final_ln")(x), valid


class DeliberationEncoder(nn.Module):
    """transformer_postencoder.py analog: acoustic states cross-attend to the
    transcript states, residual + FFN blocks."""

    layers: int
    heads: int
    ffn: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, enc, enc_valid, tr, tr_valid, deterministic=True):
        x = enc
        mask = tr_valid[:, None, :]
        for i in range(self.layers):
            h = LayerNorm(dtype=self.dtype, name=f"ln1_{i}")(x)
            x = x + MultiHeadedAttention(
                self.heads, 0.0, dtype=self.dtype, name=f"cross_{i}"
            )(h, tr, tr, mask, deterministic)
            h = LayerNorm(dtype=self.dtype, name=f"ln2_{i}")(x)
            x = x + PositionwiseFeedForward(
                self.ffn, 0.0, dtype=self.dtype, name=f"ffn_{i}"
            )(h, deterministic)
        return jnp.where(enc_valid[..., None], x, 0.0)


class SLUModel(nn.Module):
    cfg: SLUConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.asr = ASRModel(cfg.asr, dtype=self.dtype, name="asr")
        self.intent_head = nn.Dense(cfg.n_intents, dtype=self.dtype, name="intent_head")
        if cfg.use_transcript:
            self.transcript_enc = TranscriptEncoder(
                cfg.transcript_vocab_size or cfg.asr.vocab_size,
                cfg.asr.encoder.output_size, cfg.transcript_layers,
                cfg.transcript_heads, cfg.transcript_ffn,
                dtype=self.dtype, name="transcript_enc",
            )
            self.deliberation = DeliberationEncoder(
                cfg.deliberation_layers, cfg.transcript_heads,
                cfg.transcript_ffn, dtype=self.dtype, name="deliberation",
            )

    def encode(self, speech, speech_lengths, deterministic: bool = True,
               transcript=None, transcript_lengths=None):
        enc, enc_lens = self.asr.encode(speech, speech_lengths, deterministic)
        if self.cfg.use_transcript and transcript is not None:
            tr, tr_valid = self.transcript_enc(
                transcript, transcript_lengths, deterministic
            )
            enc_valid = make_valid_mask(enc_lens, enc.shape[1])
            enc = self.deliberation(enc, enc_valid, tr, tr_valid, deterministic)
        return enc, enc_lens

    def ctc_log_softmax(self, encoder_out):
        return self.asr.ctc_log_softmax(encoder_out)

    def decoder_logits(self, *a, **kw):
        return self.asr.decoder_logits(*a, **kw)

    def classify_intent(self, encoder_out, encoder_out_lengths):
        valid = make_valid_mask(encoder_out_lengths, encoder_out.shape[1])[..., None]
        denom = jnp.maximum(encoder_out_lengths[:, None].astype(encoder_out.dtype), 1)
        pooled = jnp.sum(jnp.where(valid, encoder_out, 0.0), axis=1) / denom
        return self.intent_head(pooled)

    def __call__(
        self,
        speech, speech_lengths, text, text_lengths,
        intent=None,  # [B] or [B, 1] intent class ids
        intent_lengths=None,
        transcript=None,  # [B, Lt] transcript ids (postdecoder conditioning)
        transcript_lengths=None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        from llm_guided_asr_tpu.ops.losses import (
            add_sos_eos,
            ctc_loss,
            label_smoothing_loss,
        )

        cfg = self.cfg.asr
        enc, enc_lens = self.encode(
            speech, speech_lengths, deterministic, transcript, transcript_lengths
        )
        stats: Dict[str, jnp.ndarray] = {}
        loss_ctc = jnp.asarray(0.0, jnp.float32)
        if cfg.ctc_weight > 0.0:
            loss_ctc = ctc_loss(
                self.asr.ctc_logits(enc), enc_lens, text, text_lengths, cfg.blank_id
            )
            stats["loss_ctc"] = loss_ctc
        loss_att = jnp.asarray(0.0, jnp.float32)
        if cfg.ctc_weight < 1.0:
            ys_in, ys_out = add_sos_eos(
                text, text_lengths, cfg.sos_id, cfg.eos_id, cfg.ignore_id
            )
            dec_logits = self.decoder_logits(
                enc, enc_lens, ys_in, text_lengths + 1, deterministic
            )
            loss_att = label_smoothing_loss(
                dec_logits, ys_out, cfg.lsm_weight, cfg.ignore_id,
                cfg.length_normalized_loss,
            )
            stats["loss_att"] = loss_att
            stats["acc"] = accuracy(dec_logits, ys_out, cfg.ignore_id)
        if cfg.ctc_weight == 0.0:
            loss = loss_att
        elif cfg.ctc_weight == 1.0:
            loss = loss_ctc
        else:
            loss = cfg.ctc_weight * loss_ctc + (1.0 - cfg.ctc_weight) * loss_att
        if intent is not None:
            logits = self.classify_intent(enc, enc_lens)
            labels = intent.reshape(-1)[: speech.shape[0]]
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            loss_intent = -jnp.mean(
                jnp.take_along_axis(logp, labels[:, None], axis=-1)
            )
            stats = {**stats, "loss_intent": loss_intent,
                     "acc_intent": jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))}
            loss = loss + self.cfg.intent_weight * loss_intent
        stats["loss"] = loss
        return loss, stats, jnp.asarray(speech.shape[0], jnp.float32)


@dataclasses.dataclass(frozen=True)
class ASVSpoofConfig:
    """espnet2/asvspoof/ rebuild: binary spoof detection over speech."""

    frontend: Any = None  # FrontendConfig
    adim: int = 64
    layers: int = 2


class ASVSpoofModel(nn.Module):
    """Conv + pooled binary classifier (asvspoof/espnet_model.py analog,
    binary-loss variant)."""

    cfg: ASVSpoofConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        speech, speech_lengths,
        label=None,  # [B] 0=bonafide 1=spoof
        label_lengths=None,
        deterministic: bool = True,
    ):
        from llm_guided_asr_tpu.ops.frontend import default_frontend, utterance_mvn

        f = self.cfg.frontend
        feats, flens = default_frontend(
            speech, speech_lengths, fs=f.fs, n_fft=f.n_fft, hop_length=f.hop_length,
            n_mels=f.n_mels,
        )
        feats = utterance_mvn(feats, flens).astype(self.dtype)
        x = feats
        for i in range(self.cfg.layers):
            x = nn.Conv(self.cfg.adim, (3,), padding="SAME", dtype=self.dtype,
                        name=f"conv_{i}")(x)
            x = jax.nn.relu(nn.LayerNorm(dtype=self.dtype, name=f"ln_{i}")(x))
        valid = make_valid_mask(flens, x.shape[1])[..., None]
        pooled = jnp.sum(jnp.where(valid, x, 0.0), 1) / jnp.maximum(
            flens[:, None].astype(x.dtype), 1
        )
        logit = nn.Dense(1, dtype=self.dtype, name="head")(pooled)[..., 0]
        if label is None:
            return logit
        y = label.reshape(-1)[: speech.shape[0]].astype(jnp.float32)
        z = jnp.clip(logit, -30, 30)
        loss = jnp.mean(jnp.maximum(z, 0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z))))
        acc = jnp.mean(((logit > 0) == (y > 0.5)).astype(jnp.float32))
        return loss, {"loss": loss, "acc": acc}, jnp.asarray(speech.shape[0], jnp.float32)
