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
    # prediction head (espnet2/hubert/espnet_model.py:266 HubertPretrainModel
    # + hubert_loss.py HubertPretrainLoss, which delegate to the fairseq
    # criterion semantics):
    #   cosine  — project frames to final_dim, score against a learned label
    #             embedding table by cosine similarity / logit_temp (the
    #             original HuBERT head; reference default path)
    #   softmax — plain linear -> n_clusters logits (round-3 head, kept for
    #             checkpoints that trained with it)
    head: str = "cosine"
    final_dim: int = 64
    logit_temp: float = 0.1
    # loss composition (hubert_loss.py:28-36 defaults)
    pred_masked_weight: float = 1.0
    pred_nomask_weight: float = 0.0
    # weight of the conv-feature L2 penalty ("extra loss" / features_pen in
    # the fairseq criterion the reference wraps; hubert_loss.py:63-74)
    loss_weights: float = 10.0


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
        if cfg.head == "cosine":
            self.final_proj = nn.Dense(cfg.final_dim, dtype=self.dtype,
                                       name="final_proj")
            self.label_embs = self.param(
                "label_embs", nn.initializers.normal(0.02),
                (cfg.n_clusters, cfg.final_dim),
            )
        else:
            self.final_proj = nn.Dense(cfg.n_clusters, dtype=self.dtype,
                                       name="final_proj")

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

    def encode(self, speech, speech_lengths, mask_rng=None, deterministic=True,
               return_feats=False):
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
        if return_feats:
            return x, flens, masked, feats
        return x, flens, masked

    def _head_logits(self, x: jnp.ndarray) -> jnp.ndarray:
        """Per-frame cluster scores [B, T, C].

        cosine head: L2-normalized final_proj(x) against L2-normalized label
        embeddings, divided by logit_temp — CE over these scores equals the
        fairseq criterion's CE over [sim-to-target, sims-to-all] with target
        index 0 (the logsumexp is over the same set of similarities).
        """
        if self.cfg.head != "cosine":
            return self.final_proj(x)
        z = self.final_proj(x).astype(jnp.float32)
        z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-6)
        e = self.label_embs.astype(jnp.float32)
        e = e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-6)
        return jnp.einsum("btd,cd->btc", z, e) / self.cfg.logit_temp

    def __call__(
        self,
        speech: jnp.ndarray,  # [B, N]
        speech_lengths: jnp.ndarray,
        units: jnp.ndarray,  # [B, T'] cluster targets (padded -1)
        units_lengths: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        cfg = self.cfg
        rng = self.make_rng("mask") if not deterministic else None
        x, flens, masked, feats = self.encode(
            speech, speech_lengths, rng, deterministic, return_feats=True
        )
        valid = make_valid_mask(flens, x.shape[1])
        if rng is None:
            # deterministic eval: mask every other frame
            masked = (jnp.arange(x.shape[1])[None, :] % 2 == 1) & valid
        logits = self._head_logits(x)  # [B, T, C]
        t = min(logits.shape[1], units.shape[1])
        logits = logits[:, :t]
        tgt = units[:, :t]
        has_tgt = tgt >= 0

        def _ce_acc(sel):
            """Mean CE + fairseq-style accuracy over the selected frames.

            compute_correct (espnet_model.py:444-457): a frame counts as
            correct when argmax hits the target UNLESS argmin also does
            (constant rows score zero).
            """
            n = jnp.maximum(jnp.sum(sel), 1)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(
                logp, jnp.maximum(tgt, 0)[..., None], axis=-1
            )[..., 0]
            ce = jnp.sum(jnp.where(sel, nll, 0.0)) / n
            hit_max = jnp.argmax(logits, -1) == tgt
            hit_min = jnp.argmin(logits, -1) == tgt
            acc = jnp.sum(jnp.where(sel, hit_max & ~hit_min, False)) / n
            return ce, acc

        loss_m, acc_m = _ce_acc(has_tgt & masked[:, :t])
        loss_u, acc_u = _ce_acc(has_tgt & ~masked[:, :t] & valid[:, :t])
        # conv-feature L2 penalty (fairseq features_pen; under the reference
        # criterion's per-sample normalization it enters as loss_weights*pen)
        feat_pen = jnp.mean(feats.astype(jnp.float32) ** 2)
        loss = cfg.pred_masked_weight * loss_m
        if cfg.pred_nomask_weight > 0:
            loss = loss + cfg.pred_nomask_weight * loss_u
        if cfg.loss_weights > 0:
            loss = loss + cfg.loss_weights * feat_pen
        stats = {
            "loss": loss,
            "loss_m": loss_m,
            "loss_u": loss_u,
            "acc_masked": acc_m,
            "acc_unmask": acc_u,
            "features_pen": feat_pen,
        }
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
