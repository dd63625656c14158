"""Speaker embedding (espnet2/spk/ minimal-but-real rebuild).

Mirrors the reference structure (spk/espnet_model.py, encoder/ecapa_tdnn.py
lite, pooling/chn_attn_stat_pooling.py, loss/aamsoftmax.py):

- ECAPA-lite encoder: conv1d + dilated SE-free res blocks over log-mel;
- attentive statistics pooling (mean || attn-weighted std);
- embedding projection + ArcFace/AAM-softmax training loss;
- cosine-similarity scoring for verification trials.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.ops.frontend import FrontendConfig, default_frontend
from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


@dataclasses.dataclass(frozen=True)
class SpkConfig:
    n_speakers: int = 100
    frontend: FrontendConfig = FrontendConfig(n_fft=512, hop_length=160, n_mels=80)
    hidden: int = 256
    layers: int = 3
    embed_dim: int = 192
    aam_margin: float = 0.2
    aam_scale: float = 30.0


class ECAPALiteEncoder(nn.Module):
    cfg: SpkConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray, valid: jnp.ndarray, deterministic=True):
        cfg = self.cfg
        x = nn.Conv(cfg.hidden, (5,), padding="SAME", dtype=self.dtype, name="conv_in")(feats)
        x = jax.nn.relu(x)
        outs = []
        for i in range(cfg.layers):
            h = nn.Conv(
                cfg.hidden, (3,), kernel_dilation=(2**i,), padding="SAME",
                dtype=self.dtype, name=f"res_{i}",
            )(x)
            h = jax.nn.relu(nn.LayerNorm(dtype=self.dtype, name=f"ln_{i}")(h))
            x = x + h
            outs.append(x)
        x = jnp.concatenate(outs, axis=-1)
        x = jax.nn.relu(nn.Dense(cfg.hidden, dtype=self.dtype, name="proj")(x))
        return jnp.where(valid[..., None], x, 0.0)


class AttentiveStatsPooling(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
        """[B, T, D] -> [B, 2D] attention-weighted mean || std."""
        h = jnp.tanh(nn.Dense(x.shape[-1] // 2, dtype=self.dtype, name="attn_1")(x))
        w = nn.Dense(x.shape[-1], dtype=self.dtype, name="attn_2")(h)  # [B, T, D]
        w = jnp.where(valid[..., None], w, -1e9)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=1)
        mean = jnp.sum(w * x, axis=1)
        var = jnp.sum(w * (x - mean[:, None, :]) ** 2, axis=1)
        std = jnp.sqrt(jnp.clip(var, 1e-7, None))
        return jnp.concatenate([mean, std], axis=-1)


def aam_softmax_loss(
    embeddings: jnp.ndarray,  # [B, E] (unnormalized)
    weight: jnp.ndarray,  # [E, C] class prototypes
    labels: jnp.ndarray,  # [B]
    margin: float = 0.2,
    scale: float = 30.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ArcFace additive-angular-margin softmax (spk/loss/aamsoftmax.py)."""
    e = embeddings / jnp.linalg.norm(embeddings, axis=-1, keepdims=True)
    w = weight / jnp.linalg.norm(weight, axis=0, keepdims=True)
    cos = jnp.clip(e @ w, -1.0 + 1e-7, 1.0 - 1e-7)  # [B, C]
    theta = jnp.arccos(cos)
    onehot = jax.nn.one_hot(labels, cos.shape[-1])
    cos_m = jnp.cos(theta + margin)
    logits = scale * jnp.where(onehot > 0, cos_m, cos)
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.mean(jnp.sum(onehot * logp, axis=-1))
    acc = jnp.mean((jnp.argmax(cos, axis=-1) == labels).astype(jnp.float32))
    return loss, acc


class SpeakerModel(nn.Module):
    """spk/espnet_model.py analog: forward(speech, lens, spk_labels) -> loss."""

    cfg: SpkConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = ECAPALiteEncoder(self.cfg, dtype=self.dtype, name="encoder")
        self.pooling = AttentiveStatsPooling(dtype=self.dtype, name="pooling")
        self.projector = nn.Dense(self.cfg.embed_dim, dtype=self.dtype, name="projector")
        self.aam_weight = self.param(
            "aam_weight",
            nn.initializers.xavier_uniform(),
            (self.cfg.embed_dim, self.cfg.n_speakers),
        )

    def extract_embedding(self, speech, speech_lengths, deterministic: bool = True):
        f = self.cfg.frontend
        feats, feats_lengths = default_frontend(
            speech, speech_lengths, fs=f.fs, n_fft=f.n_fft, hop_length=f.hop_length,
            n_mels=f.n_mels,
        )
        valid = make_valid_mask(feats_lengths, feats.shape[1])
        x = self.encoder(feats.astype(self.dtype), valid, deterministic)
        pooled = self.pooling(x, valid)
        return self.projector(pooled)

    def __call__(
        self,
        speech: jnp.ndarray,
        speech_lengths: jnp.ndarray,
        spk_labels: jnp.ndarray,  # [B] int
        spk_labels_lengths: Optional[jnp.ndarray] = None,  # collate artifact, unused
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        emb = self.extract_embedding(speech, speech_lengths, deterministic)
        labels = spk_labels.reshape(-1)[: speech.shape[0]]
        loss, acc = aam_softmax_loss(
            emb, self.aam_weight, labels, self.cfg.aam_margin, self.cfg.aam_scale
        )
        stats = {"loss": loss, "acc": acc}
        return loss, stats, jnp.asarray(speech.shape[0], jnp.float32)


def cosine_score(emb1: jnp.ndarray, emb2: jnp.ndarray) -> jnp.ndarray:
    """Verification trial score (spk_inference)."""
    a = emb1 / jnp.linalg.norm(emb1, axis=-1, keepdims=True)
    b = emb2 / jnp.linalg.norm(emb2, axis=-1, keepdims=True)
    return jnp.sum(a * b, axis=-1)
