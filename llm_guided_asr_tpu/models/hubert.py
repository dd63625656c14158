"""HuBERT-style self-supervised pretraining (espnet2/hubert/ rebuild).

Mirrors the reference structure (hubert/espnet_model.py +
asr/encoder/hubert_encoder.py pretraining path): a conv waveform feature
extractor, span masking with a learned mask embedding, a transformer context
network, and masked cluster prediction (cross-entropy against k-means unit
targets provided as data, like the reference's offline-clustered labels).

Also provides ``kmeans_units`` — a tiny on-host k-means over MFCC-ish log-mel
features to generate the pseudo-label targets (the reference shells out to
sklearn in its recipe stage).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from llm_guided_asr_tpu.models.transformer import (
    PositionalEncoding,
    TransformerEncoderLayer,
)
from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


@dataclasses.dataclass(frozen=True)
class HubertConfig:
    n_clusters: int = 100
    adim: int = 128
    heads: int = 2
    units: int = 256
    layers: int = 4
    conv_channels: int = 128
    # conv feature extractor strides multiply to the frame rate divisor
    conv_strides: Tuple[int, ...] = (5, 4, 2, 2)  # 16 kHz -> 100 Hz frames
    conv_kernels: Tuple[int, ...] = (10, 8, 4, 4)
    mask_prob: float = 0.4
    mask_span: int = 4


class ConvFeatureExtractor(nn.Module):
    cfg: HubertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, speech: jnp.ndarray) -> jnp.ndarray:
        x = speech[..., None]  # [B, N, 1]
        for i, (k, s) in enumerate(zip(self.cfg.conv_kernels, self.cfg.conv_strides)):
            x = nn.Conv(
                self.cfg.conv_channels, (k,), strides=(s,), padding="VALID",
                use_bias=False, dtype=self.dtype, name=f"conv_{i}",
            )(x)
            x = jax.nn.gelu(nn.LayerNorm(dtype=self.dtype, name=f"ln_{i}")(x))
        return x

    @staticmethod
    def out_lengths(cfg: HubertConfig, lengths: jnp.ndarray) -> jnp.ndarray:
        for k, s in zip(cfg.conv_kernels, cfg.conv_strides):
            lengths = (lengths - k) // s + 1
        return jnp.maximum(lengths, 0)


class HubertModel(nn.Module):
    cfg: HubertConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.feature_extractor = ConvFeatureExtractor(cfg, dtype=self.dtype, name="fe")
        self.proj = nn.Dense(cfg.adim, dtype=self.dtype, name="proj")
        self.mask_emb = self.param(
            "mask_emb", nn.initializers.normal(0.1), (cfg.adim,)
        )
        self.pos = PositionalEncoding(0.1, dtype=self.dtype, name="pos")
        self.blocks = [
            TransformerEncoderLayer(cfg.heads, cfg.units, 0.1, dtype=self.dtype,
                                    name=f"block_{i}")
            for i in range(cfg.layers)
        ]
        self.final_proj = nn.Dense(cfg.n_clusters, dtype=self.dtype, name="final_proj")

    def _span_mask(self, rng, b, t, valid):
        """Random span mask [B, T] (wav2vec2-style)."""
        cfg = self.cfg
        start_prob = cfg.mask_prob / cfg.mask_span
        starts = jax.random.uniform(rng, (b, t)) < start_prob
        mask = jnp.zeros((b, t), bool)
        for off in range(cfg.mask_span):
            shifted = jnp.pad(starts, ((0, 0), (off, 0)))[:, :t]
            mask = mask | shifted
        return mask & valid

    def encode(self, speech, speech_lengths, mask_rng=None, deterministic=True):
        cfg = self.cfg
        feats = self.feature_extractor(speech.astype(self.dtype))
        flens = ConvFeatureExtractor.out_lengths(cfg, speech_lengths)
        flens = jnp.minimum(flens, feats.shape[1])
        x = self.proj(feats)
        valid = make_valid_mask(flens, x.shape[1])
        masked = jnp.zeros(valid.shape, bool)
        if mask_rng is not None:
            masked = self._span_mask(mask_rng, x.shape[0], x.shape[1], valid)
            x = jnp.where(masked[..., None], self.mask_emb[None, None, :], x)
        x = self.pos(x, deterministic)
        for blk in self.blocks:
            x = blk(x, valid[:, None, :], deterministic)
        return x, flens, masked

    def __call__(
        self,
        speech: jnp.ndarray,  # [B, N]
        speech_lengths: jnp.ndarray,
        units: jnp.ndarray,  # [B, T'] cluster targets (padded -1)
        units_lengths: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        rng = self.make_rng("mask") if not deterministic else None
        x, flens, masked = self.encode(speech, speech_lengths, rng, deterministic)
        if rng is None:
            # deterministic eval: mask every other frame
            valid = make_valid_mask(flens, x.shape[1])
            masked = (jnp.arange(x.shape[1])[None, :] % 2 == 1) & valid
        logits = self.final_proj(x)  # [B, T, C]
        t = min(logits.shape[1], units.shape[1])
        logits = logits[:, :t]
        tgt = units[:, :t]
        tgt_valid = (tgt >= 0) & masked[:, :t]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, jnp.maximum(tgt, 0)[..., None], axis=-1)[..., 0]
        denom = jnp.maximum(jnp.sum(tgt_valid), 1)
        loss = jnp.sum(jnp.where(tgt_valid, nll, 0.0)) / denom
        acc = jnp.sum(
            jnp.where(tgt_valid, (jnp.argmax(logits, -1) == tgt), False)
        ) / denom
        stats = {"loss": loss, "acc_masked": acc}
        return loss, stats, jnp.asarray(speech.shape[0], jnp.float32)


def kmeans_units(
    feats: np.ndarray,  # [N, D] pooled frame features
    n_clusters: int,
    n_iters: int = 20,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Plain k-means (recipe clustering stage analog).  Returns (labels, centroids)."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(feats), size=min(n_clusters, len(feats)), replace=False)
    centroids = feats[idx].copy()
    for _ in range(n_iters):
        d = ((feats[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
        labels = d.argmin(1)
        for c in range(len(centroids)):
            sel = feats[labels == c]
            if len(sel):
                centroids[c] = sel.mean(0)
    d = ((feats[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
    return d.argmin(1), centroids
