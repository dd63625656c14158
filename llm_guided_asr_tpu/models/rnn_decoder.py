"""RNN attention decoder for ASR (espnet2/asr/decoder/rnn_decoder.py).

Location-aware attention (espnet/nets/pytorch_backend/rnn/attentions.py
AttLoc) + LSTM decoder, matching the reference's ``--decoder rnn`` choice.
Exposes the same ``(enc, enc_lens, ys_in, ys_in_lens) -> logits`` contract as
the TransformerDecoder, so the hybrid model, label-smoothing loss, and the
on-device beam search (stateless full-prefix recompute) all work unchanged.

TPU mapping: the token recurrence is one ``nn.scan`` over the label axis —
each step is batched attention + LSTM cell updates.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


@dataclasses.dataclass(frozen=True)
class RNNDecoderConfig:
    vocab_size: int = 100
    hidden: int = 256
    layers: int = 1
    embed_dim: int = 128
    att_dim: int = 128
    att_filters: int = 10
    att_kernel: int = 15
    dropout_rate: float = 0.0

    @classmethod
    def from_dict(cls, d: dict) -> "RNNDecoderConfig":
        from llm_guided_asr_tpu.utils.config import filter_known_fields

        return cls(**filter_known_fields(cls, d, "decoder_conf"))


class _RNNDecCell(nn.Module):
    cfg: RNNDecoderConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, token, enc, enc_proj, enc_valid):
        cfg = self.cfg
        states, att_w = carry
        emb = nn.Embed(cfg.vocab_size, cfg.embed_dim, dtype=self.dtype,
                       name="embed")(jnp.clip(token, 0, cfg.vocab_size - 1))
        # location-aware attention on the top LSTM hidden state
        h_top = states[-1][1]
        loc = nn.Conv(cfg.att_filters, (cfg.att_kernel,), padding="SAME",
                      dtype=self.dtype, name="att_conv")(att_w[..., None])
        q = nn.Dense(cfg.att_dim, use_bias=False, dtype=self.dtype, name="att_q")(h_top)
        f = nn.Dense(cfg.att_dim, use_bias=False, dtype=self.dtype, name="att_f")(loc)
        e = nn.Dense(1, use_bias=False, dtype=self.dtype, name="att_v")(
            jnp.tanh(q[:, None, :] + enc_proj + f)
        )[..., 0]
        e = jnp.where(enc_valid, e, -1e10)
        att_w = jax.nn.softmax(e.astype(jnp.float32), axis=-1).astype(self.dtype)
        ctx = jnp.einsum("bl,bld->bd", att_w, enc)

        x = jnp.concatenate([emb, ctx], axis=-1)
        new_states = []
        for i in range(cfg.layers):
            cell = nn.OptimizedLSTMCell(cfg.hidden, name=f"lstm_{i}")
            st, x = cell(states[i], x)
            new_states.append(st)
        logits = nn.Dense(cfg.vocab_size, dtype=self.dtype, name="output")(
            jnp.concatenate([x, ctx], axis=-1)
        )
        return (tuple(new_states), att_w), logits


class RNNDecoder(nn.Module):
    cfg: RNNDecoderConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        self.cell = _RNNDecCell(self.cfg, dtype=self.dtype, name="cell")
        self.enc_proj_layer = nn.Dense(
            self.cfg.att_dim, use_bias=False, dtype=self.dtype, name="enc_proj"
        )

    def __call__(
        self,
        enc: jnp.ndarray,  # [B, T, D]
        enc_lengths: jnp.ndarray,
        ys_in: jnp.ndarray,  # [B, L]
        ys_in_lengths: jnp.ndarray,
        deterministic: bool = True,
        only_last: bool = False,
    ) -> jnp.ndarray:
        cfg = self.cfg
        b, l = ys_in.shape
        enc_proj = self.enc_proj_layer(enc)
        enc_valid = make_valid_mask(enc_lengths, enc.shape[1])
        states = tuple(
            (jnp.zeros((b, cfg.hidden)), jnp.zeros((b, cfg.hidden)))
            for _ in range(cfg.layers)
        )
        att0 = enc_valid.astype(jnp.float32)
        att0 = att0 / jnp.maximum(jnp.sum(att0, -1, keepdims=True), 1.0)
        scan = nn.scan(
            lambda cell, c, tok: cell(c, tok, enc, enc_proj, enc_valid),
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=1, out_axes=1,
        )
        _, logits = scan(self.cell, (states, att0.astype(self.dtype)), ys_in)
        if only_last:
            return logits[jnp.arange(b), ys_in_lengths - 1]
        return logits
