"""Transformer building blocks (flax.linen), TPU-first.

Functional rebuild of the blocks under
espnet/nets/pytorch_backend/transformer/ (attention.py, embedding.py,
positionwise_feed_forward.py, subsampling.py, decoder_layer.py) used by the
espnet2 encoders/decoders.  All attention is computed in one batched einsum
per projection so it tiles onto the MXU; masks are additive -inf biases.

Conventions:
- masks are boolean with True = attend (the *valid* convention);
- every module takes ``deterministic`` to gate dropout;
- params are f32; activations follow ``dtype`` (bf16 for large-scale runs).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

NEG_INF = -1.0e9  # large-negative attention bias; avoids bf16 inf-nan traps


def LayerNorm(*args, **kwargs):
    """LayerNorm with torch's default epsilon (1e-5, vs flax's 1e-6) so
    ingested reference checkpoints reproduce reference numerics exactly
    (parity harness caught a compounding ~5% drift from the eps mismatch)."""
    kwargs.setdefault("epsilon", 1e-5)
    return nn.LayerNorm(*args, **kwargs)


def sinusoidal_pos_enc(length: int, d_model: int, dtype=jnp.float32) -> np.ndarray:
    """Classic sinusoidal table [length, d_model] (embedding.py PositionalEncoding)."""
    position = np.arange(length, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * -(math.log(10000.0) / d_model)
    )
    pe = np.zeros((length, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe.astype(dtype)


def rel_pos_enc(length: int, d_model: int, dtype=jnp.float32) -> np.ndarray:
    """Transformer-XL style table for positions [length-1 .. -(length-1)].

    Matches espnet RelPositionalEncoding ('latest' rel_pos_type,
    embedding.py:RelPositionalEncoding): row i encodes relative position
    (length-1-i), shape [2*length-1, d_model].
    """
    pos = np.arange(length - 1, -length, -1, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * -(math.log(10000.0) / d_model)
    )
    pe = np.zeros((2 * length - 1, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(pos * div_term)
    pe[:, 1::2] = np.cos(pos * div_term)
    return pe.astype(dtype)


class PositionwiseFeedForward(nn.Module):
    hidden_units: int
    dropout_rate: float = 0.1
    activation: Callable = jax.nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        d_model = x.shape[-1]
        h = nn.Dense(self.hidden_units, dtype=self.dtype, name="w_1")(x)
        h = self.activation(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(d_model, dtype=self.dtype, name="w_2")(h)


class MultiHeadedAttention(nn.Module):
    """Standard MHA (attention.py MultiHeadedAttention): q/k/v/out dense + softmax."""

    num_heads: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, Tq, D]
        key: jnp.ndarray,  # [B, Tk, D]
        value: jnp.ndarray,  # [B, Tk, D]
        mask: Optional[jnp.ndarray] = None,  # [B, Tq, Tk] or [B, 1, Tk]; True=attend
        deterministic: bool = True,
        return_weights: bool = False,  # guided-attention loss consumers
        kv_precomputed=None,  # optional ([B,Tk,H,dk], [B,Tk,H,dk]) — skip k/v proj
        project_kv_only: bool = False,  # return (k, v) projections and stop
    ) -> jnp.ndarray:
        d_model = (query if query is not None else key).shape[-1]
        h, d_k = self.num_heads, d_model // self.num_heads

        def proj(x, name):
            y = nn.Dense(d_model, dtype=self.dtype, name=name)(x)
            return y.reshape(*y.shape[:-1], h, d_k)

        if project_kv_only:
            # cached cross-attention (decode_step hot loop): the memory k/v
            # projections are utterance-constant — compute them once here and
            # feed them back per step via kv_precomputed
            return proj(key, "linear_k"), proj(value, "linear_v")

        q = proj(query, "linear_q")  # [B, Tq, H, dk]
        if kv_precomputed is not None:
            k, v = kv_precomputed
        else:
            k = proj(key, "linear_k")
            v = proj(value, "linear_v")

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(d_k)
        attn = _masked_softmax(scores, mask)
        # attention-map capture for plotting (calculate_all_attentions analog):
        # collected only when apply() asks for the 'intermediates' collection
        self.sow("intermediates", "attn_weights", attn)
        attn_drop = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn_drop, v)
        out = out.reshape(*out.shape[:-2], d_model)
        out = nn.Dense(d_model, dtype=self.dtype, name="linear_out")(out)
        if return_weights:
            return out, attn
        return out


def _masked_softmax(scores: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Softmax with valid-mask and all-masked-row zeroing (attention.py:forward_attention)."""
    if mask is not None:
        if mask.ndim == 3:
            mask = mask[:, None, :, :]  # [B, 1, Tq, Tk]
        scores = jnp.where(mask, scores, NEG_INF)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(scores.dtype)
        attn = jnp.where(mask, attn, 0.0)
    else:
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(scores.dtype)
    return attn


class RelPositionMultiHeadedAttention(nn.Module):
    """Transformer-XL relative-position MHA (attention.py RelPositionMultiHeadedAttention).

    score = ((q + u) k^T + rel_shift((q + v) p^T)) / sqrt(d_k)
    where p is the projected relative positional embedding of length 2T-1.

    impl: "auto" uses the fused Pallas kernel (ops/rel_attention.py) on TPU
    when eligible (key-only mask, T <= 512) — it avoids the [B, H, T, 2T-1]
    materialization + rel-shift copies (~1.2 ms/layer fwd+bwd at the
    flagship dims).  Attention-prob dropout runs *inside* the kernel (keep
    mask = counter-based hash seeded per step from the flax dropout rng),
    so the kernel engages during training too.  "dense" forces the XLA path
    (bit-parity with ingested reference checkpoints, attention-map sowing).
    """

    num_heads: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    impl: str = "auto"  # auto | dense | fused

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, T, D]
        pos_emb: jnp.ndarray,  # [1 or B, 2T-1, D]
        mask: Optional[jnp.ndarray] = None,  # [B, T, T] or [B, 1, T]
        deterministic: bool = True,
    ) -> jnp.ndarray:
        d_model = x.shape[-1]
        h, d_k = self.num_heads, d_model // self.num_heads
        t = x.shape[1]

        def proj(y, name, use_bias=True):
            z = nn.Dense(d_model, dtype=self.dtype, use_bias=use_bias, name=name)(y)
            return z.reshape(*z.shape[:-1], h, d_k)

        q = proj(x, "linear_q")
        k = proj(x, "linear_k")
        v = proj(x, "linear_v")
        p = proj(pos_emb, "linear_pos", use_bias=False)  # [1, 2T-1, H, dk]

        u = self.param("pos_bias_u", nn.initializers.xavier_uniform(), (h, d_k))
        vb = self.param("pos_bias_v", nn.initializers.xavier_uniform(), (h, d_k))
        u = u.astype(self.dtype)
        vb = vb.astype(self.dtype)

        use_fused = (
            self.impl in ("auto", "fused")
            # impl="fused" forces the kernel even off-TPU (interpret mode;
            # lets CPU tests cover this wiring), "auto" requires real TPU
            and (self.impl == "fused" or jax.default_backend() == "tpu")
            # attention plots (train/attention_plot.py) need the sown probs:
            # when the caller made "intermediates" mutable, take the dense
            # path which materializes and sows them
            and not self.is_mutable_collection("intermediates")
            and mask is not None and mask.ndim == 3 and mask.shape[1] == 1
            and pos_emb.shape[0] == 1 and pos_emb.shape[1] == 2 * t - 1
            and t <= 512 and d_k % 8 == 0
        )
        if use_fused:
            from llm_guided_asr_tpu.ops.rel_attention import (
                rel_attention_pad_pos,
                rel_flash_attention,
            )

            tp = -(-t // 128) * 128
            pad = tp - t

            def to_bhtd(y):
                y = jnp.moveaxis(y, 2, 1)  # [B, H, T, dk]
                return jnp.pad(y, ((0, 0), (0, 0), (0, pad), (0, 0)))

            qu = to_bhtd(q + u)
            qv = to_bhtd(q + vb)
            kk = to_bhtd(k)
            vv = to_bhtd(v)
            p_pad = rel_attention_pad_pos(p[0], t, tp)
            kv_valid = jnp.pad(
                mask[:, 0, :].astype(jnp.int32), ((0, 0), (0, pad))
            )
            # attention-prob dropout rides inside the kernel: a per-step
            # int32 seed folded out of the flax dropout key drives the
            # counter-based in-kernel mask (ops/rel_attention.py
            # dropout_keep_mask) — this is what lets the fused kernel run
            # during *training* (dropout > 0), not only at inference
            drop_rate = 0.0
            seed = None
            if self.dropout_rate > 0.0 and not deterministic:
                drop_rate = float(self.dropout_rate)
                kd = self.make_rng("dropout")
                if jnp.issubdtype(kd.dtype, jax.dtypes.prng_key):
                    kd = jax.random.key_data(kd)  # typed (e.g. rbg) key
                seed = jnp.sum(kd.astype(jnp.uint32)).astype(jnp.int32)
            out = rel_flash_attention(
                qu, qv, kk, vv, p_pad.astype(qu.dtype), kv_valid,
                1.0 / math.sqrt(d_k), seed=seed, dropout_rate=drop_rate,
            )
            out = jnp.moveaxis(out[:, :, :t], 1, 2).reshape(x.shape[0], t, d_model)
            return nn.Dense(d_model, dtype=self.dtype, name="linear_out")(out)

        # content score
        ac = jnp.einsum("bqhd,bkhd->bhqk", q + u, k)
        # position score: [B, H, T, 2T-1] -> rel-shift -> [B, H, T, T]
        bd = jnp.einsum("bqhd,bphd->bhqp", q + vb, p)
        bd = _rel_shift(bd, t)
        scores = (ac + bd) / math.sqrt(d_k)
        attn = _masked_softmax(scores, mask)
        self.sow("intermediates", "attn_weights", attn)
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(*out.shape[:-2], d_model)
        return nn.Dense(d_model, dtype=self.dtype, name="linear_out")(out)


def _rel_shift(x: jnp.ndarray, t: int) -> jnp.ndarray:
    """[B, H, T, 2T-1] -> [B, H, T, T] rel-shift (attention.py:rel_shift, zero_triu=False).

    Row i of the output selects columns (T-1-i) .. (2T-2-i) of the input,
    i.e. relative positions (i-j) mapped onto the 2T-1 table.
    """
    b, h, _, p = x.shape
    # standard pad-reshape trick
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(b, h, p + 1, t)
    x = x[:, :, 1:, :]
    x = x.reshape(b, h, t, p)
    return x[:, :, :, :t]


class PositionalEncoding(nn.Module):
    """x * sqrt(d) + sinusoidal PE, with dropout (embedding.py PositionalEncoding)."""

    dropout_rate: float = 0.1
    max_len: int = 5000
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True, offset: int = 0) -> jnp.ndarray:
        d_model = x.shape[-1]
        t = x.shape[1]
        pe = jnp.asarray(sinusoidal_pos_enc(max(self.max_len, offset + t), d_model))
        x = x * math.sqrt(d_model) + pe[None, offset : offset + t].astype(self.dtype)
        return nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)


class RelPositionalEncoding(nn.Module):
    """Scale input and emit the 2T-1 relative PE table (embedding.py RelPositionalEncoding)."""

    dropout_rate: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        d_model = x.shape[-1]
        t = x.shape[1]
        x = x * math.sqrt(d_model)
        pos = jnp.asarray(rel_pos_enc(t, d_model))[None].astype(self.dtype)
        drop = nn.Dropout(self.dropout_rate)
        return (
            drop(x, deterministic=deterministic),
            drop(pos, deterministic=deterministic),
        )


class Conv2dSubsampling(nn.Module):
    """x4 time subsampling via two stride-2 3x3 convs (subsampling.py Conv2dSubsampling).

    [B, T, F] -> [B, T//4(ish), odim]; output length per utterance is
    (((L - 1) // 2 - 1) // 2) computed by :func:`sub4_lengths`.
    """

    odim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, f = x.shape
        h = x[..., None]  # NHWC: [B, T, F, 1]
        h = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype, name="conv_0")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype, name="conv_1")(h)
        h = jax.nn.relu(h)
        b2, t2, f2, c = h.shape
        h = h.reshape(b2, t2, f2 * c)
        return nn.Dense(self.odim, dtype=self.dtype, name="out")(h)


def sub4_lengths(lengths: jnp.ndarray, t: Optional[int] = None) -> jnp.ndarray:
    """Sequence lengths after Conv2dSubsampling, matching the reference's
    mask arithmetic (subsampling.py: mask[:, :-2:2][:, :-2:2]): frames whose
    receptive field is only partially inside the utterance count as valid,
    giving ceil-style (L+3)//4 clamped to the conv output width for ``t``
    padded input frames. (A floor-style (((L-1)//2-1)//2 undercounts by up to
    2 frames vs the reference — caught by the golden parity harness.)"""
    out = (lengths + 3) // 4
    if t is not None:
        out = jnp.minimum(out, sub4_frames(t))
    return out


def sub4_frames(t: int) -> int:
    return ((t - 1) // 2 - 1) // 2


class TransformerEncoderLayer(nn.Module):
    """Pre-norm transformer encoder layer (espnet encoder_layer.py, normalize_before)."""

    num_heads: int
    linear_units: int
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        drop = nn.Dropout(self.dropout_rate)
        h = LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = MultiHeadedAttention(
            self.num_heads, self.attention_dropout_rate, dtype=self.dtype, name="self_attn"
        )(h, h, h, mask, deterministic)
        x = x + drop(h, deterministic=deterministic)
        h = LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = PositionwiseFeedForward(
            self.linear_units, self.dropout_rate, dtype=self.dtype, name="feed_forward"
        )(h, deterministic)
        x = x + drop(h, deterministic=deterministic)
        return x


class DecoderLayer(nn.Module):
    """Pre-norm transformer decoder layer (decoder_layer.py): self-attn, src-attn, FFN."""

    num_heads: int
    linear_units: int
    dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,  # [B, Lq, D]
        tgt_mask: Optional[jnp.ndarray],  # [B, Lq, Lk_self] True=attend
        memory: jnp.ndarray,  # [B, T, D]
        memory_mask: Optional[jnp.ndarray],  # [B, 1 or Lq, T]
        deterministic: bool = True,
        self_kv: Optional[jnp.ndarray] = None,  # [B, Lk_self, D] full key/value stream
        mem_kv=None,  # precomputed memory (k, v) projections (decode cache)
        project_mem_kv_only: bool = False,  # return src_attn's (k, v) of memory
    ) -> jnp.ndarray:
        if project_mem_kv_only:
            return MultiHeadedAttention(
                self.num_heads, self.src_attention_dropout_rate, dtype=self.dtype,
                name="src_attn",
            )(None, memory, memory, None, project_kv_only=True)
        drop = nn.Dropout(self.dropout_rate)
        norm1 = LayerNorm(dtype=self.dtype, name="norm1")
        h = norm1(tgt)
        hk = norm1(self_kv) if self_kv is not None else h
        h = MultiHeadedAttention(
            self.num_heads, self.self_attention_dropout_rate, dtype=self.dtype, name="self_attn"
        )(h, hk, hk, tgt_mask, deterministic)
        x = tgt + drop(h, deterministic=deterministic)
        h = LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = MultiHeadedAttention(
            self.num_heads, self.src_attention_dropout_rate, dtype=self.dtype, name="src_attn"
        )(h, memory, memory, memory_mask, deterministic, kv_precomputed=mem_kv)
        x = x + drop(h, deterministic=deterministic)
        h = LayerNorm(dtype=self.dtype, name="norm3")(x)
        h = PositionwiseFeedForward(
            self.linear_units, self.dropout_rate, dtype=self.dtype, name="feed_forward"
        )(h, deterministic)
        x = x + drop(h, deterministic=deterministic)
        return x


class FlashSelfAttention(nn.Module):
    """Self-attention through the Pallas TPU flash kernel
    (jax.experimental.pallas.ops.tpu.flash_attention) — O(T) memory, no
    [B, H, T, T] materialization; the long-form encoder path
    (SURVEY §5.7's optional fused-attention upgrade).

    Parameter tree matches MultiHeadedAttention (linear_q/k/v/out) so
    checkpoints swap freely; non-TPU backends and incompatible shapes fall
    back to the dense path with identical numerics.  Valid-length masking
    rides flash's SegmentIds (pads live in segment 0, valid frames in 1).
    """

    num_heads: int
    dropout_rate: float = 0.0  # applied on the output proj path only
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, T, D]
        valid: jnp.ndarray,  # [B, T] bool
        deterministic: bool = True,
    ) -> jnp.ndarray:
        d_model = x.shape[-1]
        h, d_k = self.num_heads, d_model // self.num_heads

        def proj(name):
            y = nn.Dense(d_model, dtype=self.dtype, name=name)(x)
            return y.reshape(*y.shape[:-1], h, d_k)

        q = proj("linear_q")
        k = proj("linear_k")
        v = proj("linear_v")

        use_flash = False
        try:
            use_flash = (
                jax.devices()[0].platform == "tpu"
                and d_k in (64, 128, 256)
            )
        except Exception:
            pass

        if use_flash:
            from jax.experimental.pallas.ops.tpu import flash_attention as fa

            b, t = x.shape[0], x.shape[1]
            pad = (-t) % 128
            qh = jnp.moveaxis(q, 2, 1)  # [B, H, T, dk]
            kh = jnp.moveaxis(k, 2, 1)
            vh = jnp.moveaxis(v, 2, 1)
            if pad:
                qh = jnp.pad(qh, ((0, 0), (0, 0), (0, pad), (0, 0)))
                kh = jnp.pad(kh, ((0, 0), (0, 0), (0, pad), (0, 0)))
                vh = jnp.pad(vh, ((0, 0), (0, 0), (0, pad), (0, 0)))
            seg = jnp.pad(valid.astype(jnp.int32), ((0, 0), (0, pad)))
            blk = min(512, qh.shape[2])
            sizes = fa.BlockSizes(
                block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
                block_q_major_dkv=blk, block_k_major_dkv=blk,
                block_k_dkv=blk, block_q_dkv=blk,
                block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
            )
            out = fa.flash_attention(
                qh, kh, vh, segment_ids=fa.SegmentIds(seg, seg),
                sm_scale=1.0 / math.sqrt(d_k), block_sizes=sizes,
            )
            out = jnp.moveaxis(out[:, :, :t], 1, 2).reshape(b, t, d_model)
            out = jnp.where(valid[..., None], out, 0.0)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(d_k)
            attn = _masked_softmax(scores, valid[:, None, :])
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
            out = out.reshape(*out.shape[:-2], d_model)
        out = nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)
        return nn.Dense(d_model, dtype=self.dtype, name="linear_out")(out)
