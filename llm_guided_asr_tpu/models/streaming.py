"""Streaming encoder: contextual-block conformer.

Rebuild of espnet2/asr/encoder/contextual_block_conformer_encoder.py:
the signal is processed in fixed-size blocks; self-attention is restricted to
[carried context vector | current block]; each block emits an updated context
vector consumed by the next block (the streaming state).  This bounds the
receptive field to block-causal, so the encoder can run incrementally with
O(block) latency.

TPU mapping: the block axis is a ``lax.scan`` (sequential context chain);
within a block everything is dense attention over (block_size + 1) tokens —
small matmuls that still tile the MXU when batched over (batch x heads).

Deviation from the reference (documented): context is initialized by mean
pooling and updated to the mean of each block's output per layer, rather than
the reference's learned positional context scheme — same interface and
streaming semantics, simpler state.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.conformer import ConformerConfig, ConformerBlock, _activation
from llm_guided_asr_tpu.models.transformer import (
    LayerNorm,
    Conv2dSubsampling,
    MultiHeadedAttention,
    PositionalEncoding,
    PositionwiseFeedForward,
    sub4_lengths,
)
from llm_guided_asr_tpu.models.conformer import ConvolutionModule
from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


class ContextualBlockLayer(nn.Module):
    """One conformer layer operating blockwise with a carried context token."""

    cfg: ConformerConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        blocks: jnp.ndarray,  # [B, N, S, D] block-chunked input
        block_valid: jnp.ndarray,  # [B, N, S] bool
        ctx0: jnp.ndarray,  # [B, D] initial context
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        act = _activation(cfg.activation_type)
        drop_rate = cfg.dropout_rate
        attn = MultiHeadedAttention(
            cfg.attention_heads, cfg.attention_dropout_rate, dtype=self.dtype,
            name="self_attn",
        )
        ff_mac = (
            PositionwiseFeedForward(
                cfg.linear_units, drop_rate, activation=act, dtype=self.dtype,
                name="feed_forward_macaron",
            )
            if cfg.macaron_style
            else None
        )
        ff = PositionwiseFeedForward(
            cfg.linear_units, drop_rate, activation=act, dtype=self.dtype, name="feed_forward"
        )
        conv = (
            ConvolutionModule(
                cfg.cnn_module_kernel, "layer_norm", act, dtype=self.dtype, name="conv_module"
            )
            if cfg.use_cnn_module
            else None
        )
        norm_mac = LayerNorm(dtype=self.dtype, name="norm_ff_macaron") if cfg.macaron_style else None
        norm_mha = LayerNorm(dtype=self.dtype, name="norm_mha")
        norm_conv = LayerNorm(dtype=self.dtype, name="norm_conv") if conv is not None else None
        norm_ff = LayerNorm(dtype=self.dtype, name="norm_ff")
        norm_final = LayerNorm(dtype=self.dtype, name="norm_final")

        def block_step(ctx, x, valid):
            # x: [B, S, D], valid: [B, S]
            if ff_mac is not None:
                x = x + 0.5 * ff_mac(norm_mac(x), deterministic)
            # attention over [ctx | block]
            h = norm_mha(x)
            kv = jnp.concatenate([ctx[:, None, :], h], axis=1)  # [B, S+1, D]
            kv_valid = jnp.concatenate(
                [jnp.ones((x.shape[0], 1), bool), valid], axis=1
            )
            a = attn(h, kv, kv, kv_valid[:, None, :], deterministic)
            x = x + a
            if conv is not None:
                x = x + conv(norm_conv(x), valid, deterministic)
            x = x + (0.5 if cfg.macaron_style else 1.0) * ff(norm_ff(x), deterministic)
            x = norm_final(x)
            x = jnp.where(valid[..., None], x, 0.0)
            # next context: masked mean of this block's output
            denom = jnp.maximum(jnp.sum(valid, axis=1, keepdims=True), 1)
            new_ctx = jnp.sum(x, axis=1) / denom.astype(x.dtype)
            has_any = jnp.any(valid, axis=1, keepdims=True)
            new_ctx = jnp.where(has_any, new_ctx, ctx)
            return new_ctx, x

        # static unroll over the block axis (sequential context chain; modules
        # inside lax.scan would need nn.scan lifting — revisit for long-form)
        ctx = ctx0
        outs = []
        for bi in range(blocks.shape[1]):
            ctx, y = block_step(ctx, blocks[:, bi], block_valid[:, bi])
            outs.append(y)
        return jnp.stack(outs, axis=1), ctx


class ContextualBlockConformerEncoder(nn.Module):
    """[B, T, F] -> [B, T', D] with block-causal receptive field.

    Because attention is restricted to [forward context | current block],
    encoder outputs depend only on past blocks — so the same parameters
    support *true incremental* encoding via :meth:`encode_chunk`: feed new
    feature frames with the carried per-layer contexts and get outputs
    bit-equal to the offline pass (the online path of
    contextual_block_conformer_encoder.py, minus re-encoding)."""

    cfg: ConformerConfig
    block_size: int = 40
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        if cfg.input_layer == "conv2d":
            self.embed = Conv2dSubsampling(cfg.output_size, dtype=self.dtype, name="embed")
        elif cfg.input_layer == "linear":
            self.embed = nn.Dense(cfg.output_size, dtype=self.dtype, name="embed")
        else:
            self.embed = None
        self.pos_enc = PositionalEncoding(
            cfg.positional_dropout_rate, dtype=self.dtype, name="pos_enc"
        )
        self.layers = [
            ContextualBlockLayer(cfg, dtype=self.dtype, name=f"layer_{i}")
            for i in range(cfg.num_blocks)
        ]
        if cfg.normalize_before:
            self.after_norm = LayerNorm(dtype=self.dtype, name="after_norm")

    def __call__(
        self,
        feats: jnp.ndarray,
        feats_lengths: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        if cfg.input_layer == "conv2d":
            x = self.embed(feats)
            out_lengths = sub4_lengths(feats_lengths, feats.shape[1])
        elif cfg.input_layer == "linear":
            x = self.embed(feats)
            out_lengths = feats_lengths
        else:
            x, out_lengths = feats, feats_lengths
        x = self.pos_enc(x, deterministic)
        b, t, d = x.shape
        s = self.block_size
        n = -(-t // s)
        pad = n * s - t
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        valid = make_valid_mask(out_lengths, n * s)
        blocks = x.reshape(b, n, s, d)
        bvalid = valid.reshape(b, n, s)

        for layer in self.layers:
            # fresh zero context per layer: context may only flow forward
            # WITHIN a layer (passing layer i's final context to layer i+1
            # would leak future blocks into past outputs)
            ctx0 = jnp.zeros((b, d), self.dtype)
            blocks, _ = layer(blocks, bvalid, ctx0, deterministic)
        x = blocks.reshape(b, n * s, d)[:, :t]
        if cfg.normalize_before:
            x = self.after_norm(x)
        x = jnp.where(make_valid_mask(out_lengths, t)[..., None], x, 0.0)
        return x, out_lengths

    def encode_chunk(
        self,
        feats: jnp.ndarray,  # [B, 4*m + 6, F] raw (MVN'd) feature frames
        ctxs: jnp.ndarray,  # [num_layers, B, D] carried per-layer contexts
        pos_offset: jnp.ndarray,  # scalar: index of the first produced sub-frame
        n_valid: jnp.ndarray,  # scalar: valid sub-frames in this chunk (<= m)
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Incremental encode: the feats slice must start at input frame
        4*pos_offset so the Conv2dSubsampling windows tile identically to the
        offline pass (subsampled frame i reads input frames [4i, 4i+6]); m
        must be a multiple of block_size.  Returns ([B, m, D], new ctxs)."""
        cfg = self.cfg
        if cfg.input_layer != "conv2d":
            raise NotImplementedError("streaming encode_chunk requires conv2d input")
        x = self.embed(feats)  # [B, m, D] exactly (VALID convs on 4m+6 frames)
        b, m, d = x.shape
        s = self.block_size
        if m % s != 0:
            raise ValueError(f"chunk produces {m} sub-frames, not a multiple of block_size {s}")
        # offline applies absolute sinusoidal PE over the whole sequence; the
        # chunk's frames sit at positions [pos_offset, pos_offset + m)
        import math

        from llm_guided_asr_tpu.models.transformer import sinusoidal_pos_enc

        pe = jnp.asarray(sinusoidal_pos_enc(self.pos_enc.max_len, d)).astype(self.dtype)
        pos = jnp.clip(pos_offset + jnp.arange(m), 0, pe.shape[0] - 1)
        x = x * math.sqrt(d) + pe[pos][None]
        n = m // s
        valid = jnp.arange(m) < n_valid
        blocks = x.reshape(b, n, s, d)
        bvalid = jnp.broadcast_to(valid.reshape(1, n, s), (b, n, s))
        new_ctxs = []
        for i, layer in enumerate(self.layers):
            blocks, ctx_i = layer(blocks, bvalid, ctxs[i], deterministic)
            new_ctxs.append(ctx_i)
        x = blocks.reshape(b, m, d)
        if cfg.normalize_before:
            x = self.after_norm(x)
        x = jnp.where(valid[None, :, None], x, 0.0)
        return x, jnp.stack(new_ctxs)
