"""MultiConvformer and (VGG-)RNN encoders.

- MultiConvformerEncoder: espnet2/asr/encoder/multiconvformer_encoder.py —
  a conformer whose convolution module is a multi-kernel convolutional
  gating MLP (espnet2/asr/layers/multiconv_cgmlp.py, default
  ``concat_fusion`` merge of kernel sizes 7/15/23/31).
- RNNEncoder: espnet2/asr/encoder/rnn_encoder.py + vgg_rnn_encoder.py — a
  VGG2L conv front-end (two conv/pool stages, 4x time reduction) or plain
  projection, followed by stacked bidirectional LSTMs with per-layer
  projections.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.conformer import (
    ConformerConfig,
    _activation,
)
from llm_guided_asr_tpu.models.transformer import (
    LayerNorm,
    MultiHeadedAttention,
    PositionwiseFeedForward,
    PositionalEncoding,
    RelPositionalEncoding,
    RelPositionMultiHeadedAttention,
    Conv2dSubsampling,
    sub4_lengths,
)
from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


class MultiConvCGMLP(nn.Module):
    """Multi-kernel convolutional gating MLP (multiconv_cgmlp.py,
    ``concat_fusion``: parallel depthwise convs over the gate, concatenated,
    fused by a merge depthwise conv, then projected back)."""

    linear_units: int
    kernel_sizes: Tuple[int, ...] = (7, 15, 23, 31)
    merge_kernel: int = 31
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, valid: jnp.ndarray, deterministic: bool = True):
        d = x.shape[-1]
        h = nn.Dense(self.linear_units, dtype=self.dtype, name="channel_proj1")(x)
        h = jax.nn.gelu(h)
        a, b = jnp.split(h, 2, axis=-1)
        g = LayerNorm(dtype=self.dtype, name="norm")(b)
        g = jnp.where(valid[..., None], g, 0.0)
        from llm_guided_asr_tpu.models.conformer import DepthwiseConv1d

        outs = []
        for i, k in enumerate(self.kernel_sizes):
            outs.append(
                DepthwiseConv1d(k, dtype=self.dtype,
                                name=f"depthwise_conv_{i}")(g)
            )
        m = jnp.concatenate(outs, axis=-1)
        m = jnp.where(valid[..., None], m, 0.0)
        m = DepthwiseConv1d(self.merge_kernel, dtype=self.dtype,
                            name="merge_conv")(m)
        m = nn.Dense(g.shape[-1], dtype=self.dtype, name="merge_proj")(m)
        h = a * m
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(d, dtype=self.dtype, name="channel_proj2")(h)


class MultiConvformerBlock(nn.Module):
    cfg: ConformerConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb, valid, deterministic: bool = True):
        cfg = self.cfg
        act = _activation(cfg.activation_type)
        drop = nn.Dropout(cfg.dropout_rate)
        attn_mask = valid[:, None, :]

        if cfg.macaron_style:
            h = LayerNorm(dtype=self.dtype, name="norm_ff_macaron")(x)
            h = PositionwiseFeedForward(
                cfg.linear_units, cfg.dropout_rate, activation=act,
                dtype=self.dtype, name="feed_forward_macaron",
            )(h, deterministic)
            x = x + 0.5 * drop(h, deterministic=deterministic)

        h = LayerNorm(dtype=self.dtype, name="norm_mha")(x)
        if cfg.selfattention_layer_type == "rel_selfattn":
            h = RelPositionMultiHeadedAttention(
                cfg.attention_heads, cfg.attention_dropout_rate,
                dtype=self.dtype, name="self_attn",
            )(h, pos_emb, attn_mask, deterministic)
        else:
            h = MultiHeadedAttention(
                cfg.attention_heads, cfg.attention_dropout_rate,
                dtype=self.dtype, name="self_attn",
            )(h, h, h, attn_mask, deterministic)
        x = x + drop(h, deterministic=deterministic)

        h = LayerNorm(dtype=self.dtype, name="norm_conv")(x)
        h = MultiConvCGMLP(
            cfg.linear_units, cfg.multicgmlp_kernel_sizes,
            dropout_rate=cfg.dropout_rate, dtype=self.dtype, name="cgmlp",
        )(h, valid, deterministic)
        x = x + drop(h, deterministic=deterministic)

        h = LayerNorm(dtype=self.dtype, name="norm_ff")(x)
        h = PositionwiseFeedForward(
            cfg.linear_units, cfg.dropout_rate, activation=act,
            dtype=self.dtype, name="feed_forward",
        )(h, deterministic)
        scale = 0.5 if cfg.macaron_style else 1.0
        x = x + scale * drop(h, deterministic=deterministic)
        if not cfg.normalize_before:
            x = LayerNorm(dtype=self.dtype, name="norm_final")(x)
        return x


class MultiConvformerEncoder(nn.Module):
    cfg: ConformerConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, feats_lengths, deterministic: bool = True):
        cfg = self.cfg
        if cfg.input_layer == "conv2d":
            x = Conv2dSubsampling(cfg.output_size, dtype=self.dtype, name="embed")(feats)
            out_lengths = sub4_lengths(feats_lengths, feats.shape[1])
        else:
            x = nn.Dense(cfg.output_size, dtype=self.dtype, name="embed")(feats)
            out_lengths = feats_lengths
        if cfg.pos_enc_layer_type == "rel_pos":
            x, pos_emb = RelPositionalEncoding(
                cfg.positional_dropout_rate, dtype=self.dtype, name="pos_enc"
            )(x, deterministic)
        else:
            x = PositionalEncoding(
                cfg.positional_dropout_rate, dtype=self.dtype, name="pos_enc"
            )(x, deterministic)
            pos_emb = None
        valid = make_valid_mask(out_lengths, x.shape[1])
        for i in range(cfg.num_blocks):
            x = MultiConvformerBlock(cfg, dtype=self.dtype, name=f"block_{i}")(
                x, pos_emb, valid, deterministic
            )
        if cfg.normalize_before:
            x = LayerNorm(dtype=self.dtype, name="after_norm")(x)
        x = jnp.where(valid[..., None], x, 0.0)
        return x, out_lengths


class VGG2L(nn.Module):
    """Two conv/max-pool stages, 4x time (and freq) reduction
    (espnet/nets/pytorch_backend/rnn/encoders.py VGG2L)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        x = feats[..., None]  # [B, T, F, 1]
        for i, ch in enumerate((64, 128)):
            x = jax.nn.relu(nn.Conv(ch, (3, 3), padding="SAME",
                                    dtype=self.dtype, name=f"conv{i}_1")(x))
            x = jax.nn.relu(nn.Conv(ch, (3, 3), padding="SAME",
                                    dtype=self.dtype, name=f"conv{i}_2")(x))
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        b, t, f, c = x.shape
        return x.reshape(b, t, f * c)


class RNNEncoder(nn.Module):
    """(VGG +) stacked BiLSTM encoder with per-layer projection."""

    cfg: ConformerConfig
    dtype: Dtype = jnp.float32
    use_vgg: bool = True

    @nn.compact
    def __call__(self, feats, feats_lengths, deterministic: bool = True):
        cfg = self.cfg
        if self.use_vgg and cfg.input_layer == "conv2d":
            x = VGG2L(dtype=self.dtype, name="vgg")(feats)
            out_lengths = feats_lengths // 4
        else:
            x = nn.Dense(cfg.output_size, dtype=self.dtype, name="embed")(feats)
            out_lengths = feats_lengths
        hidden = cfg.output_size
        for i in range(cfg.num_blocks):
            fwd = nn.RNN(nn.OptimizedLSTMCell(hidden), name=f"lstm_f{i}")(x)
            bwd = nn.RNN(nn.OptimizedLSTMCell(hidden), reverse=True,
                         keep_order=True, name=f"lstm_b{i}")(x)
            x = jnp.concatenate([fwd, bwd], axis=-1)
            x = jnp.tanh(nn.Dense(hidden, dtype=self.dtype, name=f"proj{i}")(x))
        valid = make_valid_mask(out_lengths, x.shape[1])
        x = jnp.where(valid[..., None], x, 0.0)
        return x, out_lengths
