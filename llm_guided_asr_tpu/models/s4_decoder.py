"""S4 (structured state-space) decoder — TPU-native S4D.

Rebuild of espnet2/asr/decoder/s4_decoder.py + the state_spaces/ package
(~4k LoC of kernel library): the reference computes S4 kernels with a
custom Cauchy CUDA/torch kernel; here the diagonal variant S4D (Gu et al.
2022) makes the kernel a Vandermonde product — one complex einsum that XLA
maps straight onto the MXU, no custom kernel needed:

    Abar = exp(dt * A)            (ZOH discretization, A diagonal complex)
    K[l] = 2 Re( sum_n C_n * (Abar_n - 1)/A_n * Abar_n^l )
    y    = causal_depthwise_conv(u, K) + D * u

Each decoder block = pre-norm [S4D over the token axis (causal by
construction) -> cross-attention to the encoder memory -> FFN], mirroring
the reference's SequenceModel layer stack with interleaved attention
(state_spaces/attention.py).  The decoder exposes the standard
``(enc, enc_lens, ys, ys_lens) -> logits`` contract, so the hybrid model
and the on-device beam search use it unchanged (full-prefix recompute; the
linear-recurrence stepping mode is a future cached scorer).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from llm_guided_asr_tpu.models.transformer import (
    LayerNorm,
    MultiHeadedAttention,
    PositionwiseFeedForward,
)
from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


@dataclasses.dataclass(frozen=True)
class S4DecoderConfig:
    vocab_size: int = 100
    d_model: int = 256
    d_state: int = 16  # N (complex pairs: N//2 modes)
    n_layers: int = 4
    attention_heads: int = 4
    linear_units: int = 1024
    dropout_rate: float = 0.0
    dt_min: float = 1e-3
    dt_max: float = 1e-1

    @classmethod
    def from_dict(cls, d: dict) -> "S4DecoderConfig":
        from llm_guided_asr_tpu.utils.config import filter_known_fields

        return cls(**filter_known_fields(cls, d, "decoder_conf"))


class S4DLayer(nn.Module):
    """Diagonal SSM over the sequence axis; causal by construction."""

    cfg: S4DecoderConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        """[B, L, H] -> [B, L, H]."""
        cfg = self.cfg
        h = cfg.d_model
        n = cfg.d_state // 2

        def dt_init(key, shape):
            r = jax.random.uniform(key, shape)
            return jnp.log(cfg.dt_min) + r * (
                jnp.log(cfg.dt_max) - jnp.log(cfg.dt_min)
            )

        log_dt = self.param("log_dt", dt_init, (h,))
        # S4D-Lin init: A_n = -1/2 + i*pi*n
        log_a_re = self.param(
            "log_a_re", lambda k, s: jnp.full(s, math.log(0.5)), (h, n)
        )
        a_im = self.param(
            "a_im", lambda k, s: jnp.broadcast_to(
                math.pi * jnp.arange(n), s
            ).astype(jnp.float32), (h, n),
        )
        c = self.param("c", nn.initializers.normal(0.5 ** 0.5), (h, n, 2))
        d_skip = self.param("d", nn.initializers.ones, (h,))

        l = u.shape[1]
        dt = jnp.exp(log_dt)[:, None]  # [H, 1]
        a = -jnp.exp(log_a_re) + 1j * a_im  # [H, N]
        dta = dt * a
        abar = jnp.exp(dta)
        bbar = (abar - 1.0) / a
        cc = c[..., 0] + 1j * c[..., 1]
        # Vandermonde: Abar^l for l = 0..L-1 (one big complex einsum -> MXU)
        powers = jnp.exp(dta[:, :, None] * jnp.arange(l)[None, None, :])  # [H,N,L]
        kernel = 2.0 * jnp.real(
            jnp.einsum("hn,hnl->hl", cc * bbar, powers)
        ).astype(self.dtype)  # [H, L]

        # causal depthwise convolution via FFT (linear conv with zero pad)
        nfft = 2 * l
        uf = jnp.fft.rfft(jnp.moveaxis(u, 1, 2).astype(jnp.float32), n=nfft)  # [B,H,F]
        kf = jnp.fft.rfft(kernel.astype(jnp.float32), n=nfft)  # [H, F]
        y = jnp.fft.irfft(uf * kf[None], n=nfft)[..., :l]  # [B, H, L]
        y = jnp.moveaxis(y, 1, 2).astype(self.dtype)
        y = y + u * d_skip[None, None, :]
        y = jax.nn.gelu(y)
        return nn.Dense(h, dtype=self.dtype, name="out_proj")(y)


class S4Decoder(nn.Module):
    """Embed -> [S4D -> cross-attention -> FFN] x n_layers -> vocab logits."""

    cfg: S4DecoderConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        enc: jnp.ndarray,
        enc_lengths: jnp.ndarray,
        ys_in: jnp.ndarray,
        ys_in_lengths: jnp.ndarray,
        deterministic: bool = True,
        only_last: bool = False,
    ) -> jnp.ndarray:
        cfg = self.cfg
        b, l = ys_in.shape
        x = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=self.dtype, name="embed")(
            jnp.clip(ys_in, 0, cfg.vocab_size - 1)
        )
        ys_valid = make_valid_mask(ys_in_lengths, l)
        # zero padded positions so the causal conv can't smear pad garbage
        x = jnp.where(ys_valid[..., None], x, 0.0)
        mem_mask = make_valid_mask(enc_lengths, enc.shape[1])[:, None, :]
        for i in range(cfg.n_layers):
            hcur = LayerNorm(dtype=self.dtype, name=f"s4_ln_{i}")(x)
            x = x + S4DLayer(cfg, dtype=self.dtype, name=f"s4_{i}")(hcur)
            hcur = LayerNorm(dtype=self.dtype, name=f"att_ln_{i}")(x)
            x = x + MultiHeadedAttention(
                cfg.attention_heads, cfg.dropout_rate, dtype=self.dtype,
                name=f"cross_{i}",
            )(hcur, enc, enc, mem_mask, deterministic)
            hcur = LayerNorm(dtype=self.dtype, name=f"ffn_ln_{i}")(x)
            x = x + PositionwiseFeedForward(
                cfg.linear_units, cfg.dropout_rate, dtype=self.dtype,
                name=f"ffn_{i}",
            )(hcur, deterministic)
            x = jnp.where(ys_valid[..., None], x, 0.0)
        x = LayerNorm(dtype=self.dtype, name="final_ln")(x)
        logits = nn.Dense(cfg.vocab_size, dtype=self.dtype, name="output")(x)
        if only_last:
            return logits[jnp.arange(b), ys_in_lengths - 1]
        return logits
