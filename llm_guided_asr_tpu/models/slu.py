"""Spoken language understanding (espnet2/slu/ rebuild, minimal-but-real).

The reference SLU task is ASR with the semantic annotation serialized into
the transcript (espnet_model.py reuse) plus optional dedicated intent
classification (postdecoder variants).  Here: the hybrid CTC/attention ASR
model extended with an utterance-level intent head over mean-pooled encoder
states; loss = asr_loss + intent_weight * intent CE.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.asr_model import ASRModel, ASRModelConfig
from llm_guided_asr_tpu.ops.losses import accuracy
from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


@dataclasses.dataclass(frozen=True)
class SLUConfig:
    asr: ASRModelConfig = None
    n_intents: int = 10
    intent_weight: float = 0.3


class SLUModel(nn.Module):
    cfg: SLUConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        self.asr = ASRModel(self.cfg.asr, dtype=self.dtype, name="asr")
        self.intent_head = nn.Dense(self.cfg.n_intents, dtype=self.dtype, name="intent_head")

    def encode(self, speech, speech_lengths, deterministic: bool = True):
        return self.asr.encode(speech, speech_lengths, deterministic)

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
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        loss_asr, stats, weight = self.asr(
            speech, speech_lengths, text, text_lengths, deterministic
        )
        loss = loss_asr
        if intent is not None:
            enc, enc_lens = self.asr.encode(speech, speech_lengths, deterministic)
            logits = self.classify_intent(enc, enc_lens)
            labels = intent.reshape(-1)[: speech.shape[0]]
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            loss_intent = -jnp.mean(
                jnp.take_along_axis(logp, labels[:, None], axis=-1)
            )
            stats = {**stats, "loss_intent": loss_intent,
                     "acc_intent": jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))}
            loss = loss_asr + self.cfg.intent_weight * loss_intent
            stats["loss"] = loss
        return loss, stats, weight


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
