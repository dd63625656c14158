"""Pre/post-encoder modules: sinc convolutions + length adaptor.

Rebuild of espnet2/asr/preencoder/sinc.py (LightweightSincConvs, Kürzinger
et al. arXiv:2010.07597 — learned band-pass filters directly on raw audio
frames from the sliding-window frontend, espnet2/asr/frontend/windowing.py)
and espnet2/asr/postencoder/length_adaptor_postencoder.py (strided conv
time downsampling after the encoder).

TPU-first notes: the sinc kernel is synthesized from the 2-parameter band
edges inside the traced graph (a [out, N] outer product — microscopic next
to the conv itself), frames are processed as one batched channels-last conv
over the intra-frame axis (no per-frame loop), and the frame unfold is a
strided gather XLA turns into a single windowed load.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def sliding_window(
    speech: jnp.ndarray,  # [B, N]
    speech_lengths: jnp.ndarray,  # [B]
    win_length: int = 400,
    hop_length: int = 160,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Raw-audio framing (windowing.py:57 SlidingWindow.forward).

    [B, N] -> [B, T, win_length]; T = (N - win) // hop + 1."""
    n = speech.shape[1]
    t = max((n - win_length) // hop_length + 1, 1)
    starts = jnp.arange(t) * hop_length
    idx = starts[:, None] + jnp.arange(win_length)[None, :]  # [T, W]
    frames = speech[:, jnp.clip(idx, 0, n - 1)]  # [B, T, W]
    out_lengths = jnp.maximum((speech_lengths - win_length) // hop_length + 1, 1)
    return frames, out_lengths.astype(jnp.int32)


def mel_filter_bank(out_channels: int, fs: float) -> jnp.ndarray:
    """Even mel-spaced (f_min, f_max) band-edge init, normalized by fs
    (sinc_conv.py MelScale.bank)."""

    def hz2mel(f):
        return 1125.0 * math.log(f / 700.0 + 1.0)

    def mel2hz(m):
        return 700.0 * (math.exp(m / 1125.0) - 1.0)

    edges = [
        mel2hz(hz2mel(30.0) + i * (hz2mel(fs / 2.0) - hz2mel(30.0)) / (out_channels + 1))
        for i in range(out_channels + 2)
    ]
    bank = [(edges[i], edges[i + 2]) for i in range(out_channels)]
    return jnp.asarray(bank, jnp.float32) / fs


class SincConv1d(nn.Module):
    """Parametric band-pass conv (espnet2/layers/sinc_conv.py:31 SincConv).

    Learns per-filter (f_min, band) pairs; the time-domain kernel is
    rebuilt from them every call:
        k[n] = (sin(2*pi*f_max*n) - sin(2*pi*f_min*n)) / (n*pi) * w[n]
    with a Hamming window w on the half-kernel (sinc_conv.py:146-157)."""

    out_channels: int = 128
    kernel_size: int = 101
    fs: float = 16000.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B*, D, 1] -> [B*, D-K+1, out_channels] (VALID conv)."""
        assert self.kernel_size % 2 == 1, "sinc kernel must be odd"
        f = self.param(
            "f", lambda *_: mel_filter_bank(self.out_channels, self.fs),
            (self.out_channels, 2),
        )
        n = self.kernel_size // 2
        xs = 2 * math.pi * jnp.linspace(1, n, n)  # [N]
        # hamming window over the flipped half (sinc_conv.py:124-127)
        lw = 2 * n + 1
        window = 0.54 - 0.46 * jnp.cos(2.0 * math.pi * jnp.flip(jnp.linspace(1, n, n)) / lw)
        f_min = jnp.abs(f[:, 0])
        f_max = f_min + jnp.abs(f[:, 1] - f[:, 0])
        right = (jnp.sin(f_max[:, None] * xs) - jnp.sin(f_min[:, None] * xs)) / (
            0.5 * xs
        ) * window  # [C, N]
        center = (2 * f_max - 2 * f_min)[:, None]  # [C, 1]
        kernel = jnp.concatenate([jnp.flip(right, axis=1), center, right], axis=1)
        # lax conv: [B, D, 1] x [K, 1, C] -> [B, D-K+1, C]
        kernel = jnp.transpose(kernel, (1, 0))[:, None, :].astype(self.dtype)  # [K,1,C]
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel, window_strides=(1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )


class _ChannelBN(nn.Module):
    """Per-channel batch norm over all (batch*, pos) elements of [*, D, C]
    (torch BatchNorm1d analog; running stats in 'batch_stats')."""

    momentum: float = 0.9
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32).reshape(-1, c)
            mean = jnp.mean(xf, axis=0)
            var = jnp.maximum(jnp.mean(xf * xf, axis=0) - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        inv = jax.lax.rsqrt(var + self.eps)
        return ((x.astype(jnp.float32) - mean) * inv * scale + bias).astype(self.dtype)


@dataclasses.dataclass(frozen=True)
class SincPreencoderConfig:
    fs: float = 16000.0
    out_channels: int = 256
    sinc_channels: int = 128
    sinc_kernel: int = 101
    activation_type: str = "leakyrelu"  # leakyrelu | relu
    dropout_rate: float = 0.15

    @classmethod
    def from_dict(cls, d: dict) -> "SincPreencoderConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


class LightweightSincConvs(nn.Module):
    """Sinc preencoder body (sinc.py:19): SincConvBlock + 5 depthwise conv
    blocks collapse each 400-sample frame to one out_channels vector."""

    cfg: SincPreencoderConfig
    dtype: Dtype = jnp.float32

    def _act(self, x):
        if self.cfg.activation_type == "relu":
            return jax.nn.relu(x)
        return jax.nn.leaky_relu(x, 0.01)

    @nn.compact
    def __call__(
        self, frames: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        """[B, T, D] raw frames -> [B, T, out_channels]."""
        cfg = self.cfg
        b, t, d = frames.shape
        x = frames.reshape(b * t, d, 1)
        # SincConvBlock: sinc filters -> log compression -> BN -> avgpool(2)
        x = SincConv1d(cfg.sinc_channels, cfg.sinc_kernel, cfg.fs,
                       dtype=self.dtype, name="filters")(x)
        x = jnp.log(jnp.abs(x) + 1.0)  # LogCompression (sinc_conv.py:17)
        x = _ChannelBN(dtype=self.dtype, name="bn0")(x, deterministic)
        x = nn.avg_pool(x, (2,), strides=(2,))

        def dconv_block(x, i, out_ch, k, stride, avgpool, p_drop):
            # depthwise conv (groups = channels; gen_lsc_block :178-199)
            h = nn.Conv(
                out_ch, (k,), strides=(stride,), padding="VALID",
                feature_group_count=x.shape[-1], dtype=self.dtype,
                name=f"dconv_{i}",
            )(x)
            h = self._act(h)
            h = _ChannelBN(dtype=self.dtype, name=f"bn_{i}")(h, deterministic)
            if avgpool:
                h = nn.avg_pool(h, (2,), strides=(2,))
            return nn.Dropout(p_drop)(h, deterministic=deterministic)

        x = dconv_block(x, 1, cfg.sinc_channels, 25, 2, True, 0.1)
        for i in (2, 3, 4):
            x = dconv_block(x, i, cfg.out_channels, 9, 1, False, cfg.dropout_rate)
        x = dconv_block(x, 5, cfg.out_channels, 7, 1, False, cfg.dropout_rate)
        # collapse whatever intra-frame positions remain (D_out=1 at the
        # reference geometry; mean keeps other window sizes legal)
        x = jnp.mean(x, axis=1)
        return x.reshape(b, t, -1)


@dataclasses.dataclass(frozen=True)
class LengthAdaptorConfig:
    n_layers: int = 1
    input_layer: Optional[str] = None  # None | linear
    output_size: Optional[int] = None
    dropout_rate: float = 0.1

    @classmethod
    def from_dict(cls, d: dict) -> "LengthAdaptorConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        d = dict(d)
        if "length_adaptor_n_layers" in d:
            d["n_layers"] = d.pop("length_adaptor_n_layers")
        return cls(**{k: v for k, v in d.items() if k in known})


class LengthAdaptorPostEncoder(nn.Module):
    """Strided-conv time downsampler after the encoder
    (length_adaptor_postencoder.py:16, Li et al. ACL 2021)."""

    cfg: LengthAdaptorConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, T, D]
        lengths: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        if cfg.input_layer == "linear":
            x = nn.Dense(cfg.output_size, dtype=self.dtype, name="embed")(x)
            x = nn.LayerNorm(dtype=self.dtype, name="embed_ln")(x)
            x = nn.Dropout(cfg.dropout_rate)(x, deterministic=deterministic)
        d = x.shape[-1]
        for i in range(cfg.n_layers):
            x = nn.Conv(d, (2,), strides=(2,), padding="VALID", dtype=self.dtype,
                        name=f"adaptor_{i}")(x)
            x = jax.nn.relu(x)
            lengths = lengths // 2
        return x, jnp.maximum(lengths, 1)
