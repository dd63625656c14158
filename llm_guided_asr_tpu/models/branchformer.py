"""Branchformer and E-Branchformer encoders.

Rebuild of espnet2/asr/encoder/e_branchformer_encoder.py (525 LoC) and
branchformer_encoder.py (576 LoC): parallel attention + cgMLP branches.

- cgMLP (Convolutional Gating MLP, layers/cgmlp.py): up-proj -> split ->
  gate half goes through LN + depthwise conv -> elementwise gate -> down-proj.
- Branchformer block: the two branches are averaged (or concat-merged).
- E-Branchformer block: macaron FFNs around [attn || cgMLP] -> depthwise-conv
  merge -> residual; final LN.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.conformer import ConformerConfig, _activation
from llm_guided_asr_tpu.models.transformer import (
    LayerNorm,
    Conv2dSubsampling,
    MultiHeadedAttention,
    PositionalEncoding,
    PositionwiseFeedForward,
    RelPositionalEncoding,
    RelPositionMultiHeadedAttention,
    sub4_lengths,
)
from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


class ConvolutionalGatingMLP(nn.Module):
    """cgMLP (espnet2/asr/layers/cgmlp.py)."""

    linear_units: int
    kernel_size: int = 31
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

        g = DepthwiseConv1d(self.kernel_size, dtype=self.dtype,
                            name="depthwise_conv")(g)
        h = a * g
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(d, dtype=self.dtype, name="channel_proj2")(h)


class EBranchformerBlock(nn.Module):
    cfg: ConformerConfig
    merge_kernel: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb, valid, deterministic: bool = True):
        cfg = self.cfg
        drop = nn.Dropout(cfg.dropout_rate)
        attn_mask = valid[:, None, :]

        h = LayerNorm(dtype=self.dtype, name="norm_ff1")(x)
        h = PositionwiseFeedForward(
            cfg.linear_units, cfg.dropout_rate, dtype=self.dtype, name="feed_forward1"
        )(h, deterministic)
        x = x + 0.5 * drop(h, deterministic=deterministic)

        # attention branch
        ha = LayerNorm(dtype=self.dtype, name="norm_mha")(x)
        if cfg.selfattention_layer_type == "rel_selfattn" and pos_emb is not None:
            ha = RelPositionMultiHeadedAttention(
                cfg.attention_heads, cfg.attention_dropout_rate, dtype=self.dtype,
                name="attn",
            )(ha, pos_emb, attn_mask, deterministic)
        else:
            ha = MultiHeadedAttention(
                cfg.attention_heads, cfg.attention_dropout_rate, dtype=self.dtype,
                name="attn",
            )(ha, ha, ha, attn_mask, deterministic)
        ha = drop(ha, deterministic=deterministic)

        # cgMLP branch
        hc = LayerNorm(dtype=self.dtype, name="norm_mlp")(x)
        hc = ConvolutionalGatingMLP(
            cfg.linear_units, cfg.cnn_module_kernel, cfg.dropout_rate,
            dtype=self.dtype, name="cgmlp",
        )(hc, valid, deterministic)
        hc = drop(hc, deterministic=deterministic)

        # depthwise-conv merge
        cat = jnp.concatenate([ha, hc], axis=-1)
        cat = jnp.where(valid[..., None], cat, 0.0)
        m = cat + nn.Conv(
            cat.shape[-1], (self.merge_kernel,), padding="SAME",
            feature_group_count=cat.shape[-1], dtype=self.dtype, name="merge_conv",
        )(cat)
        x = x + drop(
            nn.Dense(x.shape[-1], dtype=self.dtype, name="merge_proj")(m),
            deterministic=deterministic,
        )

        h = LayerNorm(dtype=self.dtype, name="norm_ff2")(x)
        h = PositionwiseFeedForward(
            cfg.linear_units, cfg.dropout_rate, dtype=self.dtype, name="feed_forward2"
        )(h, deterministic)
        x = x + 0.5 * drop(h, deterministic=deterministic)
        return LayerNorm(dtype=self.dtype, name="norm_final")(x)


class BranchformerBlock(nn.Module):
    """Two-branch block with learned-scalar averaging merge
    (branchformer_encoder.py, merge_method='learned_ave' simplified to
    fixed average weights; 'concat' available via EBranchformer)."""

    cfg: ConformerConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb, valid, deterministic: bool = True):
        cfg = self.cfg
        drop = nn.Dropout(cfg.dropout_rate)
        attn_mask = valid[:, None, :]
        ha = LayerNorm(dtype=self.dtype, name="norm_mha")(x)
        if cfg.selfattention_layer_type == "rel_selfattn" and pos_emb is not None:
            ha = RelPositionMultiHeadedAttention(
                cfg.attention_heads, cfg.attention_dropout_rate, dtype=self.dtype, name="attn"
            )(ha, pos_emb, attn_mask, deterministic)
        else:
            ha = MultiHeadedAttention(
                cfg.attention_heads, cfg.attention_dropout_rate, dtype=self.dtype, name="attn"
            )(ha, ha, ha, attn_mask, deterministic)
        hc = LayerNorm(dtype=self.dtype, name="norm_mlp")(x)
        hc = ConvolutionalGatingMLP(
            cfg.linear_units, cfg.cnn_module_kernel, cfg.dropout_rate,
            dtype=self.dtype, name="cgmlp",
        )(hc, valid, deterministic)
        w = self.param("branch_weights", nn.initializers.zeros, (2,))
        wts = jax.nn.softmax(w)
        x = x + drop(wts[0] * ha + wts[1] * hc, deterministic=deterministic)
        return LayerNorm(dtype=self.dtype, name="norm_final")(x)


class EBranchformerEncoder(nn.Module):
    cfg: ConformerConfig
    block_cls: Any = EBranchformerBlock
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, feats: jnp.ndarray, feats_lengths: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        if cfg.input_layer == "conv2d":
            x = Conv2dSubsampling(cfg.output_size, dtype=self.dtype, name="embed")(feats)
            out_lengths = sub4_lengths(feats_lengths, feats.shape[1])
        elif cfg.input_layer == "linear":
            x = nn.Dense(cfg.output_size, dtype=self.dtype, name="embed")(feats)
            out_lengths = feats_lengths
        else:
            x, out_lengths = feats, feats_lengths
        if cfg.pos_enc_layer_type == "rel_pos":
            x, pos_emb = RelPositionalEncoding(
                cfg.positional_dropout_rate, dtype=self.dtype, name="pos_enc"
            )(x, deterministic)
        else:
            x = PositionalEncoding(cfg.positional_dropout_rate, dtype=self.dtype, name="pos_enc")(
                x, deterministic
            )
            pos_emb = None
        valid = make_valid_mask(out_lengths, x.shape[1])
        for i in range(cfg.num_blocks):
            x = self.block_cls(cfg, dtype=self.dtype, name=f"block_{i}")(
                x, pos_emb, valid, deterministic
            )
        x = jnp.where(valid[..., None], x, 0.0)
        return x, out_lengths


class BranchformerEncoder(EBranchformerEncoder):
    block_cls: Any = BranchformerBlock
