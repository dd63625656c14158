"""RWKV prediction network for the transducer decoder.

Rebuild of espnet2/asr_transducer/decoder/rwkv_decoder.py + modules/rwkv/
(attention.py SelfAttention = time-mix over the WKV kernel,
feed_forward.py ChannelMix).  The WKV recurrence itself is ops/wkv.py
(Pallas on TPU).  Layout follows RWKV-v4: per-block

  x += TimeMix(LN(x));  x += ChannelMix(LN(x))

with learned per-channel interpolation against the time-shifted input.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.ops.wkv import wkv

Dtype = Any


def _time_shift(x: jnp.ndarray) -> jnp.ndarray:
    """[B, T, C] -> previous-step x (zeros at t=0)."""
    return jnp.pad(x, ((0, 0), (1, 0), (0, 0)))[:, :-1]


class TimeMix(nn.Module):
    hidden: int
    layer_id: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.hidden
        xp = _time_shift(x)
        mu_k = self.param("mu_k", nn.initializers.uniform(1.0), (c,))
        mu_v = self.param("mu_v", nn.initializers.uniform(1.0), (c,))
        mu_r = self.param("mu_r", nn.initializers.uniform(1.0), (c,))
        xk = x * mu_k + xp * (1 - mu_k)
        xv = x * mu_v + xp * (1 - mu_v)
        xr = x * mu_r + xp * (1 - mu_r)
        k = nn.Dense(c, use_bias=False, dtype=self.dtype, name="key")(xk)
        v = nn.Dense(c, use_bias=False, dtype=self.dtype, name="value")(xv)
        r = jax.nn.sigmoid(nn.Dense(c, use_bias=False, dtype=self.dtype, name="receptance")(xr))
        time_decay = self.param("time_decay", nn.initializers.normal(0.2), (c,))
        time_first = self.param("time_first", nn.initializers.normal(0.2), (c,))
        w = -jnp.exp(time_decay.astype(jnp.float32))  # wkv_cuda.cu decay sign
        y = wkv(w, time_first.astype(jnp.float32), k, v)
        return nn.Dense(c, use_bias=False, dtype=self.dtype, name="output")(r * y)


class ChannelMix(nn.Module):
    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.hidden
        xp = _time_shift(x)
        mu_k = self.param("mu_k", nn.initializers.uniform(1.0), (c,))
        mu_r = self.param("mu_r", nn.initializers.uniform(1.0), (c,))
        xk = x * mu_k + xp * (1 - mu_k)
        xr = x * mu_r + xp * (1 - mu_r)
        k = nn.Dense(4 * c, use_bias=False, dtype=self.dtype, name="key")(xk)
        r = jax.nn.sigmoid(nn.Dense(c, use_bias=False, dtype=self.dtype, name="receptance")(xr))
        return r * nn.Dense(c, use_bias=False, dtype=self.dtype, name="value")(
            jnp.square(jax.nn.relu(k))
        )


class RWKVBlock(nn.Module):
    hidden: int
    layer_id: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x + TimeMix(self.hidden, self.layer_id, dtype=self.dtype, name="att")(
            nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        )
        x = x + ChannelMix(self.hidden, dtype=self.dtype, name="ffn")(
            nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        )
        return x


class RWKVDecoder(nn.Module):
    """Transducer prediction network with RWKV blocks
    (asr_transducer/decoder/rwkv_decoder.py)."""

    vocab_size: int
    cfg: Any  # TransducerDecoderConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, labels: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b = labels.shape[0]
        c = self.cfg.hidden_size
        y = jnp.concatenate([jnp.zeros((b, 1), labels.dtype), labels], axis=1)
        x = nn.Embed(self.vocab_size, self.cfg.embed_size, dtype=self.dtype, name="embed")(
            jnp.clip(y, 0, self.vocab_size - 1)
        )
        if self.cfg.embed_size != c:
            x = nn.Dense(c, dtype=self.dtype, name="proj")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="ln_in")(x)
        for i in range(self.cfg.num_layers):
            x = RWKVBlock(c, i, dtype=self.dtype, name=f"block_{i}")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="ln_out")(x)
        x = nn.Dropout(self.cfg.dropout_rate)(x, deterministic=deterministic)
        return x
