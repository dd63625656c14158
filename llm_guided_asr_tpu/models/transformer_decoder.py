"""Transformer attention decoder (flax.linen).

Rebuild of espnet2/asr/decoder/transformer_decoder.py (TransformerDecoder /
BaseTransformerDecoder): token embedding * sqrt(d) + sinusoidal PE, N pre-norm
decoder layers with causal self-attention and cross-attention over encoder
memory, final LayerNorm + vocab projection.

The same ``__call__`` serves training (full teacher-forced sequence) and
on-device beam search (full-prefix rescoring at a static max length — the
search loop masks by current position, so no Python-side incremental state is
needed; a fused KV-cache step path exists via ``step`` for long outputs).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.transformer import (
    LayerNorm,
    DecoderLayer,
    PositionalEncoding,
)
from llm_guided_asr_tpu.utils.masks import causal_attn_mask, make_valid_mask

Dtype = Any


@dataclasses.dataclass(frozen=True)
class TransformerDecoderConfig:
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    normalize_before: bool = True
    use_output_layer: bool = True
    # share_decoder_input_output_embed (espnet2/mt/espnet_model.py:71-79):
    # the vocab projection reuses the input embedding table (embed.attend)
    tie_input_output: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "TransformerDecoderConfig":
        from llm_guided_asr_tpu.utils.config import filter_known_fields

        return cls(**filter_known_fields(cls, d, "decoder_conf"))


class TransformerDecoder(nn.Module):
    vocab_size: int
    cfg: TransformerDecoderConfig
    dtype: Dtype = jnp.float32
    # optional externally-shared embedding table (flax module sharing);
    # MT's share_encoder_decoder_input_embed passes the parent's nn.Embed
    embed_module: Any = None

    @nn.compact
    def __call__(
        self,
        memory: jnp.ndarray,  # [B, T, D]
        memory_lengths: jnp.ndarray,  # [B]
        ys_in: jnp.ndarray,  # [B, L] token ids
        ys_in_lengths: jnp.ndarray,  # [B]
        deterministic: bool = True,
        only_last: bool = False,
        return_hidden: bool = False,
    ) -> jnp.ndarray:
        """Teacher-forced forward -> logits [B, L, vocab].

        only_last=True slices the hidden state at position len-1 BEFORE the
        vocab projection — the beam-search scoring path only needs the last
        position, and the [L, D] x [D, V] projection dominates step FLOPs.
        return_hidden=True additionally returns the pre-projection hidden
        states (reference transformer_decoder.py return_all_hiddens — the
        UnitY synthesizer consumes the text decoder's hiddens).
        """
        cfg = self.cfg
        d_model = memory.shape[-1]
        embed = self.embed_module if self.embed_module is not None else \
            nn.Embed(self.vocab_size, d_model, dtype=self.dtype, name="embed")
        x = embed(ys_in)
        x = PositionalEncoding(cfg.positional_dropout_rate, dtype=self.dtype, name="pos_enc")(
            x, deterministic
        )
        tgt_mask = causal_attn_mask(ys_in_lengths, ys_in.shape[1])  # [B, L, L]
        memory_mask = make_valid_mask(memory_lengths, memory.shape[1])[:, None, :]
        for i in range(cfg.num_blocks):
            x = DecoderLayer(
                cfg.attention_heads,
                cfg.linear_units,
                cfg.dropout_rate,
                cfg.self_attention_dropout_rate,
                cfg.src_attention_dropout_rate,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, tgt_mask, memory, memory_mask, deterministic)
        if cfg.normalize_before:
            x = LayerNorm(dtype=self.dtype, name="after_norm")(x)
        if only_last:
            x = x[jnp.arange(x.shape[0]), ys_in_lengths - 1]  # [B, D]
        hidden = x
        if cfg.use_output_layer:
            if cfg.tie_input_output:
                x = embed.attend(x.astype(embed.embedding.dtype))
            else:
                x = nn.Dense(self.vocab_size, dtype=self.dtype, name="output_layer")(x)
        if return_hidden:
            return x, hidden
        return x


class _CausalConvAttn(nn.Module):
    """Causal lightweight / dynamic convolution sublayer.

    Rebuild of espnet/nets/pytorch_backend/transformer/{lightconv,dynamic_conv}
    .py used by the lightconv/dynamicconv decoder variants
    (espnet2/asr/decoder/transformer_decoder.py LightweightConvolution*
    DynamicConvolution* subclasses): GLU input projection, depthwise causal
    conv whose kernel is either a shared learned weight (light, softmax over
    taps, shared across ``heads`` channel groups) or predicted per position
    (dynamic), then an output projection.
    """

    heads: int
    kernel_size: int
    dynamic: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b, l, d = x.shape
        k = self.kernel_size
        h = nn.Dense(2 * d, dtype=self.dtype, name="in_proj")(x)
        a, g = jnp.split(h, 2, axis=-1)
        v = a * jax.nn.sigmoid(g)  # GLU
        xp = jnp.pad(v, ((0, 0), (k - 1, 0), (0, 0)))
        windows = jnp.stack(
            [xp[:, i : i + l] for i in range(k)], axis=2
        )  # [B, L, K, D] with windows[..., -1, :] = current position
        if self.dynamic:
            w = nn.Dense(self.heads * k, dtype=self.dtype, name="weight_proj")(v)
            w = jax.nn.softmax(w.reshape(b, l, self.heads, k), axis=-1)
        else:
            wk = self.param("conv_weight", nn.initializers.normal(0.02),
                            (self.heads, k))
            w = jnp.broadcast_to(
                jax.nn.softmax(wk.astype(jnp.float32), axis=-1).astype(v.dtype),
                (b, l, self.heads, k),
            )
        group = d // self.heads
        win = windows.reshape(b, l, k, self.heads, group)
        out = jnp.einsum("blkhg,blhk->blhg", win, w).reshape(b, l, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class ConvTransformerDecoder(nn.Module):
    """Transformer decoder with lightconv/dynamicconv self-sublayers
    (espnet2 lightconv / dynamicconv decoder choices)."""

    vocab_size: int
    cfg: TransformerDecoderConfig
    dynamic: bool = False
    kernel_size: int = 11
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        memory: jnp.ndarray,
        memory_lengths: jnp.ndarray,
        ys_in: jnp.ndarray,
        ys_in_lengths: jnp.ndarray,
        deterministic: bool = True,
        only_last: bool = False,
    ) -> jnp.ndarray:
        from llm_guided_asr_tpu.models.transformer import MultiHeadedAttention, PositionwiseFeedForward

        cfg = self.cfg
        d_model = memory.shape[-1]
        x = nn.Embed(self.vocab_size, d_model, dtype=self.dtype, name="embed")(ys_in)
        x = PositionalEncoding(cfg.positional_dropout_rate, dtype=self.dtype,
                               name="pos_enc")(x, deterministic)
        valid = make_valid_mask(ys_in_lengths, ys_in.shape[1])
        x = jnp.where(valid[..., None], x, 0.0)
        memory_mask = make_valid_mask(memory_lengths, memory.shape[1])[:, None, :]
        drop = nn.Dropout(cfg.dropout_rate)
        for i in range(cfg.num_blocks):
            h = LayerNorm(dtype=self.dtype, name=f"block_{i}_norm1")(x)
            h = _CausalConvAttn(
                cfg.attention_heads, self.kernel_size, dynamic=self.dynamic,
                dtype=self.dtype, name=f"block_{i}_conv",
            )(h, deterministic)
            x = x + drop(h, deterministic=deterministic)
            h = LayerNorm(dtype=self.dtype, name=f"block_{i}_norm2")(x)
            h = MultiHeadedAttention(
                cfg.attention_heads, cfg.src_attention_dropout_rate,
                dtype=self.dtype, name=f"block_{i}_src_attn",
            )(h, memory, memory, memory_mask, deterministic)
            x = x + drop(h, deterministic=deterministic)
            h = LayerNorm(dtype=self.dtype, name=f"block_{i}_norm3")(x)
            h = PositionwiseFeedForward(
                cfg.linear_units, cfg.dropout_rate, dtype=self.dtype,
                name=f"block_{i}_ff",
            )(h, deterministic)
            x = x + drop(h, deterministic=deterministic)
        if cfg.normalize_before:
            x = LayerNorm(dtype=self.dtype, name="after_norm")(x)
        if only_last:
            x = x[jnp.arange(x.shape[0]), ys_in_lengths - 1]
        if cfg.use_output_layer:
            x = nn.Dense(self.vocab_size, dtype=self.dtype, name="output_layer")(x)
        return x
