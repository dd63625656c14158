"""AVHubert audio-visual encoder (espnet2/asr/encoder/avhubert_encoder.py).

Reference layout (1,168 LoC):
  ResEncoder (:1074)       3D-conv stem (k=(5,7,7), stride (1,2,2)) + 2D
                           ResNet-18 basic blocks per frame + spatial pool
  SubModel (:575)          modality feature extractor (resnet for video,
                           per-frame Linear for audio filterbanks)
  AVHubertModel (:593)     forward_audio/forward_video -> modality_fusion
                           (concat or add, :747-771) -> LayerNorm ->
                           post_extract_proj -> TransformerEncoder with a
                           grouped-conv positional embedding (:860-915)
  FairseqAVHubertEncoder (:73)  espnet wrapper: modality dropout (:233-247,
                           drop the audio or video half of the fused
                           features), audio-only mode, freeze-finetune gate

TPU-first notes: the per-frame 2D ResNet folds time into the batch axis (one
big conv batch instead of a frame loop); modality dropout is an rng-driven
jnp.where (no data-dependent Python branching under jit).  The espnet-side
freeze_finetune_updates counter is a trainer concern here (freeze_param /
init_param surgery), not module state.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.transformer import (
    LayerNorm,
    MultiHeadedAttention,
    PositionwiseFeedForward,
)
from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


@dataclasses.dataclass(frozen=True)
class AVHubertConfig:
    encoder_embed_dim: int = 768
    encoder_layers: int = 12
    encoder_attention_heads: int = 12
    encoder_ffn_embed_dim: int = 3072
    dropout: float = 0.1
    audio_feat_dim: int = 104  # stacked filterbank features per video frame
    resnet_channels: Tuple[int, ...] = (64, 128, 256, 512)
    resnet_blocks_per_stage: int = 2
    frontend_channels: int = 64  # 3D stem output
    modality_fuse: str = "concat"  # concat | add
    modality_dropout: float = 0.0  # P(drop one modality) at train time
    audio_dropout: float = 0.5  # P(dropped modality is audio | dropping)
    conv_pos: int = 128  # positional conv kernel
    conv_pos_groups: int = 16
    audio_only: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "AVHubertConfig":
        from llm_guided_asr_tpu.utils.config import filter_known_fields

        return cls(**filter_known_fields(cls, d, "encoder_conf"))


class BasicBlock2D(nn.Module):
    """ResNet-18 basic block (avhubert_encoder.py:966) with GroupNorm in
    place of BatchNorm (no running stats to plumb through jit)."""

    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        h = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = jax.nn.relu(nn.GroupNorm(num_groups=min(32, self.planes),
                                     dtype=self.dtype, name="gn1")(h))
        h = nn.Conv(self.planes, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = nn.GroupNorm(num_groups=min(32, self.planes), dtype=self.dtype,
                         name="gn2")(h)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, dtype=self.dtype,
                               name="down")(x)
            residual = nn.GroupNorm(num_groups=min(32, self.planes),
                                    dtype=self.dtype, name="gn_down")(residual)
        return jax.nn.relu(h + residual)


class ResEncoder(nn.Module):
    """Video frontend (avhubert_encoder.py:1074): 3D stem over (T, H, W) then
    a per-frame 2D ResNet, spatially pooled to one vector per frame."""

    cfg: AVHubertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jnp.ndarray) -> jnp.ndarray:
        """[B, T, H, W] grayscale lip ROIs -> [B, T, C_out]."""
        cfg = self.cfg
        x = video[..., None]  # [B, T, H, W, 1]
        # 3D stem: k=(5,7,7), stride (1,2,2) — time resolution preserved
        x = nn.Conv(cfg.frontend_channels, (5, 7, 7), strides=(1, 2, 2),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="stem")(x)
        x = jax.nn.relu(nn.GroupNorm(num_groups=min(32, cfg.frontend_channels),
                                     dtype=self.dtype, name="stem_gn")(x))
        # maxpool (1,3,3) stride (1,2,2)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        # fold time into batch for the 2D ResNet trunk (one big conv batch)
        b, t, h, w, c = x.shape
        x = x.reshape(b * t, h, w, c)
        for si, planes in enumerate(cfg.resnet_channels):
            for bi in range(cfg.resnet_blocks_per_stage):
                stride = 2 if (si > 0 and bi == 0) else 1
                x = BasicBlock2D(planes, stride, dtype=self.dtype,
                                 name=f"s{si}b{bi}")(x)
        x = jnp.mean(x, axis=(1, 2))  # global spatial average pool
        return x.reshape(b, t, -1)


class ConvPositionalEmbedding(nn.Module):
    """Grouped-conv relative positional embedding (wav2vec2/hubert style,
    avhubert_encoder.py:868-886)."""

    dim: int
    kernel: int = 128
    groups: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pos = nn.Conv(self.dim, (self.kernel,), padding="SAME",
                      feature_group_count=self.groups, dtype=self.dtype,
                      name="conv")(x)
        return x + jax.nn.gelu(pos)


class AVHubertModel(nn.Module):
    """Fusion + transformer trunk (avhubert_encoder.py:593)."""

    cfg: AVHubertConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        d = cfg.encoder_embed_dim
        self.feature_extractor_audio = nn.Dense(d, dtype=self.dtype,
                                                name="audio_proj")
        if not cfg.audio_only:
            self.feature_extractor_video = ResEncoder(cfg, dtype=self.dtype,
                                                      name="video_resnet")
            self.video_proj = nn.Dense(d, dtype=self.dtype, name="video_proj")
        fused = 2 * d if cfg.modality_fuse == "concat" else d
        self.fuse_norm = LayerNorm(dtype=self.dtype, name="fuse_norm")
        self.post_extract_proj = nn.Dense(d, dtype=self.dtype, name="post_proj")
        self.pos_conv = ConvPositionalEmbedding(
            d, cfg.conv_pos, cfg.conv_pos_groups, dtype=self.dtype,
            name="pos_conv",
        )
        self.layers = [
            _TrunkLayer(cfg, dtype=self.dtype, name=f"layer_{i}")
            for i in range(cfg.encoder_layers)
        ]
        self.final_norm = LayerNorm(dtype=self.dtype, name="final_norm")
        self._fused_dim = fused

    def fuse(self, audio_feats, video_feats, rng=None, deterministic=True):
        """modality_fusion (:747) + modality dropout (:233-247): under
        dropout, zero either the audio half or the video half of the fused
        features for the whole batch (the reference draws one coin per
        step)."""
        cfg = self.cfg
        d = cfg.encoder_embed_dim
        if audio_feats is None:
            audio_feats = jnp.zeros(video_feats.shape[:2] + (d,), self.dtype)
        if video_feats is None:
            video_feats = jnp.zeros(audio_feats.shape[:2] + (d,), self.dtype)
        if cfg.modality_fuse == "concat":
            fused = jnp.concatenate([audio_feats, video_feats], axis=-1)
        elif cfg.modality_fuse == "add":
            fused = audio_feats + video_feats
        else:
            raise ValueError(f"unknown fusion {cfg.modality_fuse!r}")
        if (not deterministic and cfg.modality_dropout > 0
                and cfg.modality_fuse == "concat" and rng is not None):
            r_drop, r_which = jax.random.uniform(rng, (2,))
            drop = r_drop < cfg.modality_dropout
            drop_audio = r_which < cfg.audio_dropout
            half = jnp.concatenate(
                [jnp.zeros((d,), self.dtype), jnp.ones((d,), self.dtype)]
            )
            mask = jnp.where(drop_audio, half, 1.0 - half)  # zero one half
            fused = jnp.where(drop, fused * mask, fused)
        return fused

    def __call__(
        self,
        audio: Optional[jnp.ndarray],  # [B, T, F] filterbank features
        lengths: jnp.ndarray,
        video: Optional[jnp.ndarray] = None,  # [B, T, H, W]
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        audio_feats = (
            self.feature_extractor_audio(audio.astype(self.dtype))
            if audio is not None else None
        )
        video_feats = None
        if video is not None and not cfg.audio_only:
            video_feats = self.video_proj(
                self.feature_extractor_video(video.astype(self.dtype))
            )
        rng = self.make_rng("dropout") if not deterministic else None
        x = self.fuse(audio_feats, video_feats, rng, deterministic)
        x = self.fuse_norm(x)
        x = self.post_extract_proj(x)
        x = self.pos_conv(x)
        valid = make_valid_mask(lengths, x.shape[1])
        x = jnp.where(valid[..., None], x, 0.0)
        mask = valid[:, None, :]
        for layer in self.layers:
            x = layer(x, mask, deterministic)
        return self.final_norm(x), lengths


class _TrunkLayer(nn.Module):
    cfg: AVHubertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic):
        cfg = self.cfg
        h = LayerNorm(dtype=self.dtype, name="ln1")(x)
        x = x + MultiHeadedAttention(
            cfg.encoder_attention_heads, cfg.dropout, dtype=self.dtype,
            name="attn",
        )(h, h, h, mask, deterministic)
        h = LayerNorm(dtype=self.dtype, name="ln2")(x)
        return x + PositionwiseFeedForward(
            cfg.encoder_ffn_embed_dim, cfg.dropout, dtype=self.dtype,
            name="ffn",
        )(h, deterministic)


class AVHubertEncoder(nn.Module):
    """make_encoder-compatible wrapper: (feats, lengths, deterministic) ->
    (out, out_lens).  Audio-only at the ASR-task level (the reference's
    audio_only flag, avhubert_encoder.py:264-267); the audio-visual path is
    the module-level __call__ of AVHubertModel with a video argument."""

    cfg: AVHubertConfig
    output_size_: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.trunk = AVHubertModel(self.cfg, dtype=self.dtype, name="trunk")
        self.out_proj = nn.Dense(self.output_size_, dtype=self.dtype,
                                 name="out_proj")

    def __call__(self, feats, lengths, deterministic: bool = True,
                 video: Optional[jnp.ndarray] = None):
        x, out_lens = self.trunk(feats, lengths, video, deterministic)
        return self.out_proj(x), out_lens
