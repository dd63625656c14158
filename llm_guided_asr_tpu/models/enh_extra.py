"""Additional separation architectures (espnet2/enh/separator/ breadth).

Rebuilds of the reference separators this repo's models/enh.py did not yet
cover, each an original JAX/Flax design over the shared STFT model:

- TransformerSeparator   (transformer_separator.py): post-LN transformer
  blocks over the magnitude spectrogram -> per-source T-F masks.
- DPTNetSeparator        (dptnet_separator.py, Chen et al. 2020): dual-path
  processing like DPRNN but each path runs an "improved transformer" layer
  whose feed-forward is RNN-augmented (GRU -> relu -> Dense).
- BSRNNSeparator         (bsrnn_separator.py, Yu et al. 2023): the frequency
  axis is split into bands, each band projected to a shared embedding size;
  alternating time-BiLSTM and band-BiLSTM layers; a per-band decoder emits a
  COMPLEX mask (real+imag) per bin.
- DCCRNSeparator         (dccrn_separator.py, Hu et al. 2020): complex
  U-Net — complex conv encoder (stride-2 in frequency), complex LSTM
  bottleneck, complex transposed-conv decoder with skip connections,
  bounded complex ratio mask (DCCRN-E: tanh-compressed magnitude).
- DPCLSeparator          (dpcl_separator.py, Hershey et al. 2016): deep
  clustering — a BLSTM emits a unit-norm embedding per T-F bin; training
  minimizes the affinity-matrix loss against oracle dominant-source labels,
  inference k-means-clusters the embeddings into binary masks (both the
  loss and the fixed-iteration k-means run on device).

Domain conventions (consumed by models/enh.py ESPnetEnhancementModel):
  domain = "mag_mask":     __call__([B,T,F] magnitude) -> [S,B,T,F] real masks
  domain = "complex_mask": __call__([B,T,F] complex)   -> [S,B,T,F] complex masks
  domain = "embedding":    __call__([B,T,F] magnitude) -> [B,T,F,D] embeddings
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def _mask_out(x, feat_dim, num_spk, nonlinear, dtype, name="mask"):
    masks = nn.Dense(feat_dim * num_spk, dtype=dtype, name=name)(x)
    masks = masks.reshape(*x.shape[:-1], num_spk, feat_dim)
    masks = jnp.moveaxis(masks, -2, 0)  # [S, ..., F]
    if nonlinear == "sigmoid":
        return jax.nn.sigmoid(masks)
    return jax.nn.relu(masks)


class TransformerSeparator(nn.Module):
    """Transformer masking separator (enh/separator/transformer_separator.py)."""

    cfg: Any  # EnhConfig
    dtype: Dtype = jnp.float32
    domain = "mag_mask"

    @nn.compact
    def __call__(self, feat: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        from llm_guided_asr_tpu.models.transformer import TransformerEncoderLayer

        cfg = self.cfg
        x = nn.Dense(cfg.hidden, dtype=self.dtype, name="in_proj")(feat)
        for i in range(cfg.layers):
            x = TransformerEncoderLayer(
                num_heads=4, linear_units=cfg.hidden * 4, dropout_rate=0.0,
                dtype=self.dtype, name=f"block_{i}",
            )(x, None, deterministic)
        return _mask_out(x, feat.shape[-1], cfg.num_spk, cfg.mask_nonlinear,
                         self.dtype)


class _ImprovedTransformerLayer(nn.Module):
    """DPTNet layer: MHA + RNN-augmented feed-forward (dptnet.py analog)."""

    hidden: int
    num_heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [N, L, D]
        d = self.hidden
        h = nn.LayerNorm(name="ln_attn")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=d, out_features=d,
            dtype=self.dtype, name="mha",
        )(h, h)
        x = x + h
        h = nn.LayerNorm(name="ln_ffn")(x)
        # RNN-augmented FFN: GRU -> relu -> Dense back to D
        h = nn.RNN(nn.GRUCell(d), name="ffn_gru")(h)
        h = nn.Dense(d, dtype=self.dtype, name="ffn_out")(jax.nn.relu(h))
        return x + h


class DPTNetSeparator(nn.Module):
    """Dual-path transformer separator (enh/separator/dptnet_separator.py)."""

    cfg: Any
    dtype: Dtype = jnp.float32
    domain = "mag_mask"

    @nn.compact
    def __call__(self, feat: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        from llm_guided_asr_tpu.models.enh import _merge, _segment

        cfg = self.cfg
        d = cfg.hidden
        x = nn.Dense(d, dtype=self.dtype, name="in_proj")(feat)
        chunks, t = _segment(x, cfg.chunk_size)  # [B, n, K, D]
        b, n, k, _ = chunks.shape
        for i in range(cfg.layers):
            # intra-chunk transformer (sequence = K)
            h = _ImprovedTransformerLayer(d, dtype=self.dtype, name=f"intra_{i}")(
                chunks.reshape(b * n, k, d)
            )
            chunks = h.reshape(b, n, k, d)
            # inter-chunk transformer (sequence = n)
            y = jnp.moveaxis(chunks, 1, 2).reshape(b * k, n, d)
            y = _ImprovedTransformerLayer(d, dtype=self.dtype, name=f"inter_{i}")(y)
            chunks = jnp.moveaxis(y.reshape(b, k, n, d), 1, 2)
        x = jax.nn.relu(_merge(chunks, t, cfg.chunk_size))
        return _mask_out(x, feat.shape[-1], cfg.num_spk, cfg.mask_nonlinear,
                         self.dtype)


class BSRNNSeparator(nn.Module):
    """Band-split RNN separator (enh/separator/bsrnn_separator.py).

    Splits the F axis into ``cfg.num_bands`` near-equal bands; each band's
    (real, imag) bins are layer-normed and projected to a shared embedding,
    giving a [B, T, K, N] grid processed by alternating time-BiLSTM and
    band-BiLSTM residual layers; a per-band MLP emits real+imag mask bins.
    """

    cfg: Any
    dtype: Dtype = jnp.float32
    domain = "complex_mask"

    @nn.compact
    def __call__(self, spec: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        from llm_guided_asr_tpu.models.enh import _bilstm

        cfg = self.cfg
        b, t, f = spec.shape
        nb = max(1, min(cfg.num_bands, f))
        edges = [round(i * f / nb) for i in range(nb + 1)]
        widths = [edges[i + 1] - edges[i] for i in range(nb)]
        d = cfg.hidden
        ri = jnp.concatenate(
            [jnp.real(spec), jnp.imag(spec)], axis=-1
        ).astype(self.dtype)  # [B, T, 2F]

        bands = []
        for i, (lo, w) in enumerate(zip(edges[:-1], widths)):
            xb = jnp.concatenate([ri[..., lo:lo + w], ri[..., f + lo:f + lo + w]],
                                 axis=-1)  # [B, T, 2w]
            xb = nn.LayerNorm(name=f"band_ln_{i}")(xb)
            bands.append(nn.Dense(d, dtype=self.dtype, name=f"band_fc_{i}")(xb))
        x = jnp.stack(bands, axis=2)  # [B, T, K, N]
        k = nb
        for i in range(cfg.layers):
            # time modeling per band
            h = nn.LayerNorm(name=f"time_ln_{i}")(x)
            h = jnp.moveaxis(h, 2, 1).reshape(b * k, t, d)
            h = _bilstm(h, d // 2, f"time_lstm_{i}")
            h = nn.Dense(d, dtype=self.dtype, name=f"time_proj_{i}")(h)
            x = x + jnp.moveaxis(h.reshape(b, k, t, d), 1, 2)
            # band modeling per frame
            h = nn.LayerNorm(name=f"bandmod_ln_{i}")(x)
            h = _bilstm(h.reshape(b * t, k, d), d // 2, f"band_lstm_{i}")
            h = nn.Dense(d, dtype=self.dtype, name=f"bandmod_proj_{i}")(h)
            x = x + h.reshape(b, t, k, d)

        # per-band complex mask decoder (real+imag per bin per source)
        outs = []
        s = cfg.num_spk
        for i, w in enumerate(widths):
            h = nn.LayerNorm(name=f"dec_ln_{i}")(x[:, :, i])
            h = jax.nn.tanh(nn.Dense(2 * d, dtype=self.dtype, name=f"dec_fc_{i}")(h))
            m = nn.Dense(2 * w * s, dtype=self.dtype, name=f"dec_out_{i}")(h)
            outs.append(m.reshape(b, t, s, w, 2))
        m = jnp.concatenate(outs, axis=3)  # [B, T, S, F, 2]
        mask = (m[..., 0] + 1j * m[..., 1]).astype(spec.dtype)
        return jnp.moveaxis(mask, 2, 0)  # [S, B, T, F]


def _cplx_conv(xr, xi, features, strides, name, dtype, transpose=False):
    """Complex 2-D (transposed) convolution as four real convolutions."""
    conv = nn.ConvTranspose if transpose else nn.Conv
    cr = conv(features, (3, 3), strides=strides, padding="SAME", dtype=dtype,
              name=f"{name}_r")
    ci = conv(features, (3, 3), strides=strides, padding="SAME", dtype=dtype,
              name=f"{name}_i")
    yr = cr(xr) - ci(xi)
    yi = cr(xi) + ci(xr)
    return yr, yi


class DCCRNSeparator(nn.Module):
    """Deep complex conv-recurrent separator (enh/separator/dccrn_separator.py).

    Complex conv encoder downsampling the frequency axis, complex LSTM
    bottleneck over time, complex transposed-conv decoder with encoder skip
    connections; emits a bounded complex ratio mask per source
    (DCCRN-E: tanh(|m|) * exp(i*angle(m)))."""

    cfg: Any
    dtype: Dtype = jnp.float32
    domain = "complex_mask"

    @nn.compact
    def __call__(self, spec: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        b, t, f = spec.shape
        depth = 3
        # pad F to a multiple of 2**depth for clean down/up sampling
        fp = -(-f // (1 << depth)) * (1 << depth)
        xr = jnp.pad(jnp.real(spec), ((0, 0), (0, 0), (0, fp - f)))[..., None]
        xi = jnp.pad(jnp.imag(spec), ((0, 0), (0, 0), (0, fp - f)))[..., None]
        xr = xr.astype(self.dtype)
        xi = xi.astype(self.dtype)

        chans = [cfg.hidden // 4, cfg.hidden // 2, cfg.hidden]
        skips = []
        for i, c in enumerate(chans):
            xr, xi = _cplx_conv(xr, xi, c, (1, 2), f"enc_{i}", self.dtype)
            xr = jax.nn.leaky_relu(nn.LayerNorm(name=f"enc_lnr_{i}")(xr))
            xi = jax.nn.leaky_relu(nn.LayerNorm(name=f"enc_lni_{i}")(xi))
            skips.append((xr, xi))

        # complex LSTM bottleneck over time: flatten (F', C)
        fb = xr.shape[2]
        hr = xr.reshape(b, t, fb * chans[-1])
        hi = xi.reshape(b, t, fb * chans[-1])
        lr = nn.RNN(nn.OptimizedLSTMCell(cfg.hidden), name="lstm_r")
        li = nn.RNN(nn.OptimizedLSTMCell(cfg.hidden), name="lstm_i")
        yr = lr(hr) - li(hi)
        yi = lr(hi) + li(hr)
        dr = nn.Dense(fb * chans[-1], dtype=self.dtype, name="bottle_r")
        di = nn.Dense(fb * chans[-1], dtype=self.dtype, name="bottle_i")
        xr = (dr(yr) - di(yi)).reshape(b, t, fb, chans[-1])
        xi = (dr(yi) + di(yr)).reshape(b, t, fb, chans[-1])

        for i, c in enumerate(reversed([1 * cfg.num_spk * 2] + chans[:-1])):
            sr, si = skips[depth - 1 - i]
            xr = jnp.concatenate([xr, sr], axis=-1)
            xi = jnp.concatenate([xi, si], axis=-1)
            last = i == depth - 1
            feats = cfg.num_spk * 2 if last else chans[depth - 2 - i]
            xr, xi = _cplx_conv(xr, xi, feats, (1, 2), f"dec_{i}", self.dtype,
                                transpose=True)
            if not last:
                xr = jax.nn.leaky_relu(nn.LayerNorm(name=f"dec_lnr_{i}")(xr))
                xi = jax.nn.leaky_relu(nn.LayerNorm(name=f"dec_lni_{i}")(xi))

        # [B, T, Fp, 2S] -> complex mask [S, B, T, F]
        mr = jnp.moveaxis(xr[:, :, :f], -1, 0)  # [2S, B, T, F] (real parts)
        mi = jnp.moveaxis(xi[:, :, :f], -1, 0)
        # combine channel pairs: channel 2s -> real path, 2s+1 -> imag path
        m = (mr[0::2] - mi[1::2]) + 1j * (mr[1::2] + mi[0::2])  # [S, B, T, F]
        mag = jnp.abs(m)
        bounded = jnp.tanh(mag) * m / jnp.maximum(mag, 1e-8)
        return bounded.astype(spec.dtype)


class DPCLSeparator(nn.Module):
    """Deep-clustering embedder (enh/separator/dpcl_separator.py): BLSTM over
    magnitude frames emitting a unit-norm D-dim embedding per T-F bin."""

    cfg: Any
    dtype: Dtype = jnp.float32
    domain = "embedding"

    @nn.compact
    def __call__(self, feat: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        from llm_guided_asr_tpu.models.enh import _bilstm

        cfg = self.cfg
        f = feat.shape[-1]
        x = feat
        for i in range(cfg.layers):
            x = _bilstm(x, cfg.hidden // 2, f"lstm_{i}")
        emb = nn.Dense(f * cfg.emb_dim, dtype=self.dtype, name="emb")(x)
        emb = jnp.tanh(emb).reshape(*feat.shape, cfg.emb_dim)  # [B,T,F,D]
        return emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8
        )


def dpcl_loss(emb: jnp.ndarray, refs_spec_mag: jnp.ndarray,
              mix_mag: jnp.ndarray) -> jnp.ndarray:
    """Deep-clustering affinity loss (Hershey et al. 2016, eq. 2).

    ||V V^T - Y Y^T||_F^2 expanded to the O(N D^2) form
    ||V^T V||^2 - 2 ||V^T Y||^2 + ||Y^T Y||^2 so the [N, N] affinity matrix
    is never materialized (N = T*F bins).

    emb:           [B, T, F, D] unit-norm embeddings
    refs_spec_mag: [S, B, T, F] source magnitude spectra (oracle)
    mix_mag:       [B, T, F] mixture magnitude (silence-bin weighting)
    """
    s, b, t, f = refs_spec_mag.shape
    v = emb.reshape(b, t * f, -1)  # [B, N, D]
    # oracle one-hot dominant source per bin
    dom = jnp.argmax(refs_spec_mag, axis=0)  # [B, T, F]
    y = jax.nn.one_hot(dom.reshape(b, t * f), s, dtype=v.dtype)  # [B, N, S]
    # de-emphasize near-silent bins (reference weights by mixture magnitude)
    w = mix_mag.reshape(b, t * f)
    w = (w / jnp.maximum(jnp.max(w, axis=1, keepdims=True), 1e-8))[..., None]
    v = v * jnp.sqrt(w)
    y = y * jnp.sqrt(w)
    vtv = jnp.einsum("bnd,bne->bde", v, v)
    vty = jnp.einsum("bnd,bns->bds", v, y)
    yty = jnp.einsum("bns,bnr->bsr", y, y)
    loss = (jnp.sum(vtv**2, axis=(1, 2)) - 2 * jnp.sum(vty**2, axis=(1, 2))
            + jnp.sum(yty**2, axis=(1, 2)))
    return jnp.mean(loss) / (t * f)


def kmeans_masks(emb: jnp.ndarray, num_spk: int, iters: int = 10) -> jnp.ndarray:
    """Fixed-iteration on-device k-means over T-F embeddings -> binary masks.

    emb: [B, T, F, D] -> [S, B, T, F] one-hot masks.  Deterministic init:
    first centroid = highest-norm bin... embeddings are unit-norm, so instead
    seed centroids with bins spread over time (k-means++ needs data-dependent
    randomness; a fixed stratified init is stable for separation use).
    """
    b, t, f, d = emb.shape
    x = emb.reshape(b, t * f, d)
    n = t * f
    idx = jnp.linspace(0, n - 1, num_spk).astype(jnp.int32)
    cent = x[:, idx]  # [B, S, D]

    def step(cent, _):
        d2 = jnp.sum((x[:, :, None] - cent[:, None]) ** 2, axis=-1)  # [B,N,S]
        assign = jax.nn.one_hot(jnp.argmin(d2, axis=-1), num_spk, dtype=x.dtype)
        tot = jnp.einsum("bns,bnd->bsd", assign, x)
        cnt = jnp.maximum(jnp.sum(assign, axis=1)[..., None], 1.0)
        return tot / cnt, None

    cent, _ = jax.lax.scan(step, cent, None, length=iters)
    d2 = jnp.sum((x[:, :, None] - cent[:, None]) ** 2, axis=-1)
    assign = jax.nn.one_hot(jnp.argmin(d2, axis=-1), num_spk, dtype=x.dtype)
    masks = assign.reshape(b, t, f, num_spk)
    return jnp.moveaxis(masks, -1, 0)  # [S, B, T, F]
