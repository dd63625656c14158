"""Speaker embedding package (espnet2/spk/ multi-architecture rebuild).

Mirrors the reference's registry structure (spk/espnet_model.py composes
frontend -> encoder -> pooling -> projector -> loss, each a ClassChoices):

encoders (spk/encoder/):
  - ``ecapa_lite``  repo-original small dilated-conv encoder (default,
                    LayerNorm, no running stats — CPU-test friendly)
  - ``ecapa``       EcapaTdnnEncoder (ecapa_tdnn_encoder.py:16): conv5 stem,
                    3 Res2Net EcapaBlocks (layers/ecapa_block.py:29, SE),
                    dense aggregation 3*ndim -> output 1x1 conv
  - ``rawnet3``     RawNet3Encoder (rawnet3_encoder.py:15): Bottle2neck
                    blocks (layers/rawnet_block.py:31, AFMS + maxpool),
                    skip-summed multi-scale cat
  - ``xvector``     XvectorEncoder (xvector_encoder.py:13): 5 dilated TDNN
                    conv-relu-BN layers
  - ``ska_tdnn``    SkaTdnnEncoder (ska_tdnn_encoder.py:341): 2D fcwSKA
                    front (ResBlock w/ fwSKAttention + cwSKAttention) then
                    selective-kernel Bottle2necks
  - ``identity``    passthrough (identity_encoder.py)

pooling (spk/pooling/): ``attn_stat`` (repo original), ``chn_attn_stat``
(chn_attn_stat_pooling.py:8, ECAPA channel-attentive stats over
[x, mean, std] global context), ``stats`` (stat_pooling.py), ``mean``.

projector (spk/projector/): ``dense`` (repo original), ``rawnet3`` (BN->fc),
``xvector`` (fc->relu->fc), ``ska`` (BN->fc->BN).

loss (spk/loss/): ``aamsoftmax`` (aamsoftmax.py), ``aamsoftmax_sc_itk``
(aamsoftmax_subcenter_intertopk.py:35 — sub-center max over K prototypes +
inter-top-k margin penalty on the hardest negatives).

TPU notes: channel-last [B, T, C] layout throughout ([B, T, F, C] for the
SKA 2D front); batch norm is the padding-aware MaskedBatchNorm (running
stats in the ``batch_stats`` collection); all poolings and the SE/AFMS
global contexts mask pad frames (the reference trains on fixed-length
crops and never masks — with full-length batches its statistics would
absorb pads).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.conformer import MaskedBatchNorm
from llm_guided_asr_tpu.ops.frontend import FrontendConfig, default_frontend
from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


@dataclasses.dataclass(frozen=True)
class SpkConfig:
    n_speakers: int = 100
    frontend: FrontendConfig = FrontendConfig(n_fft=512, hop_length=160, n_mels=80)
    hidden: int = 256
    layers: int = 3
    embed_dim: int = 192
    aam_margin: float = 0.2
    aam_scale: float = 30.0
    # registry choices (reference ClassChoices analogs)
    encoder: str = "ecapa_lite"  # ecapa_lite|ecapa|rawnet3|xvector|ska_tdnn|identity
    pooling: str = "attn_stat"  # attn_stat|chn_attn_stat|stats|mean
    projector: str = "dense"  # dense|rawnet3|xvector|ska
    loss: str = "aamsoftmax"  # aamsoftmax|aamsoftmax_sc_itk
    # encoder hyperparameters (reference defaults are ndim=1024, out=1536 —
    # far too large for tests; recipe configs override)
    model_scale: int = 8
    encoder_out: int = 0  # 0 = 2*hidden (ecapa/rawnet3/ska aggregate dim)
    ska_dim: int = 16  # 2D front channels (reference: 128)
    # sub-center inter-topk loss hyperparameters (reference defaults)
    subcenter_k: int = 3
    inter_topk: int = 5
    inter_topk_penalty: float = 0.06

    @classmethod
    def from_dict(cls, d: dict) -> "SpkConfig":
        from llm_guided_asr_tpu.utils.config import filter_known_fields

        d = dict(d)
        fe = d.pop("frontend", None)
        kw = filter_known_fields(cls, d, "spk model_conf")
        if isinstance(fe, dict):
            kw["frontend"] = FrontendConfig.from_dict(fe)
        elif fe is not None:
            kw["frontend"] = fe
        return cls(**kw)


def masked_mean(x: jnp.ndarray, valid: jnp.ndarray, axis=1) -> jnp.ndarray:
    m = valid[..., None].astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m, axis=axis), 1.0)
    return jnp.sum(x * m, axis=axis) / n


def masked_mean_std(
    x: jnp.ndarray, valid: jnp.ndarray, clamp: Tuple[float, float] = (1e-4, 1e4)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    m = valid[..., None].astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    mean = jnp.sum(x * m, axis=1) / n
    var = jnp.sum(((x - mean[:, None, :]) ** 2) * m, axis=1) / n
    return mean, jnp.sqrt(jnp.clip(var, *clamp))


class _BN(nn.Module):
    """BatchNorm1d analog over [B, T, C] (or [B, C] via a length-1 T axis)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid=None, train: bool = False):
        squeeze = x.ndim == 2
        if squeeze:
            x = x[:, None, :]
        if valid is None:
            valid = jnp.ones(x.shape[:2], bool)
        y = MaskedBatchNorm(dtype=self.dtype, name="bn")(
            x, valid, use_running_average=not train
        )
        return y[:, 0] if squeeze else y


class SEModule(nn.Module):
    """Squeeze-excitation over time (spk/layers/ecapa_block.py:12)."""

    bottleneck: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid, train: bool = False):
        s = masked_mean(x, valid)  # [B, C]
        s = nn.Dense(self.bottleneck, dtype=self.dtype, name="fc1")(s)
        s = _BN(dtype=self.dtype, name="bn")(jax.nn.relu(s), train=train)
        s = jax.nn.sigmoid(nn.Dense(x.shape[-1], dtype=self.dtype, name="fc2")(s))
        return x * s[:, None, :]


class AFMS(nn.Module):
    """Alpha feature-map scaling (spk/layers/rawnet_block.py:8)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid):
        c = x.shape[-1]
        alpha = self.param("alpha", nn.initializers.ones, (c,))
        y = jax.nn.sigmoid(
            nn.Dense(c, dtype=self.dtype, name="fc")(masked_mean(x, valid))
        )
        return (x + alpha.astype(x.dtype)) * y[:, None, :]


class SKAttention1d(nn.Module):
    """Selective-kernel fusion of per-kernel conv branches
    (ska_tdnn_encoder.py:155 SKAttentionModule)."""

    kernel_sizes: Sequence[int]
    dilation: int
    reduction: int = 4
    min_d: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid, train: bool = False):
        c = x.shape[-1]
        branches = []
        for k in self.kernel_sizes:
            h = nn.Conv(
                c, (k,), kernel_dilation=(self.dilation,), padding="SAME",
                dtype=self.dtype, name=f"conv_k{k}",
            )(x)
            h = _BN(dtype=self.dtype, name=f"bn_k{k}")(
                jax.nn.relu(h), valid, train=train
            )
            branches.append(h)
        u = sum(branches)
        d = max(self.min_d, c // self.reduction)
        z = jax.nn.relu(nn.Dense(d, dtype=self.dtype, name="fc")(masked_mean(u, valid)))
        logits = jnp.stack(
            [nn.Dense(c, dtype=self.dtype, name=f"fc_k{k}")(z)
             for k in self.kernel_sizes], 0,
        )  # [K, B, C]
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=0).astype(x.dtype)
        return sum(w[i][:, None, :] * b for i, b in enumerate(branches))


class Res2NetBlock(nn.Module):
    """Res2Net bottleneck shared by ECAPA / RawNet3 / SKA-TDNN.

    ``se``: EcapaBlock (layers/ecapa_block.py:29);
    ``afms`` (+optional ``pool``): rawnet Bottle2neck (rawnet_block.py:31);
    ``sk_kernels``: SKA Bottle2neck (ska_tdnn_encoder.py:30) where each split
    conv is a selective-kernel fusion.
    """

    planes: int
    kernel_size: int = 3
    dilation: int = 1
    scale: int = 8
    se: bool = False
    afms: bool = False
    pool: int = 0
    sk_kernels: Optional[Tuple[int, ...]] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid, train: bool = False):
        width = self.planes // self.scale
        inp = x
        out = nn.Conv(width * self.scale, (1,), dtype=self.dtype, name="conv1")(x)
        out = _BN(dtype=self.dtype, name="bn1")(jax.nn.relu(out), valid, train=train)
        splits = [out[..., i * width:(i + 1) * width] for i in range(self.scale)]
        outs = []
        sp = None
        for i in range(self.scale - 1):
            sp = splits[i] if sp is None else sp + splits[i]
            if self.sk_kernels:
                sp = SKAttention1d(
                    self.sk_kernels, self.dilation, dtype=self.dtype,
                    name=f"sk_{i}",
                )(sp, valid, train=train)
            else:
                sp = nn.Conv(
                    width, (self.kernel_size,), kernel_dilation=(self.dilation,),
                    padding="SAME", dtype=self.dtype, name=f"conv_{i}",
                )(sp)
                sp = _BN(dtype=self.dtype, name=f"bn_{i}")(
                    jax.nn.relu(sp), valid, train=train
                )
            outs.append(sp)
        outs.append(splits[-1])
        out = jnp.concatenate(outs, axis=-1)
        out = nn.Conv(self.planes, (1,), dtype=self.dtype, name="conv3")(out)
        out = _BN(dtype=self.dtype, name="bn3")(jax.nn.relu(out), valid, train=train)
        if self.se:
            out = SEModule(dtype=self.dtype, name="se")(out, valid, train=train)
        if inp.shape[-1] != self.planes:
            inp = nn.Conv(
                self.planes, (1,), use_bias=False, dtype=self.dtype, name="residual"
            )(inp)
        out = out + inp
        if self.pool:
            t = out.shape[1] // self.pool * self.pool
            out = out[:, :t].reshape(out.shape[0], -1, self.pool, out.shape[-1])
            # pads are masked to a large negative so they never win the max
            vm = valid[:, :t].reshape(valid.shape[0], -1, self.pool)
            out = jnp.max(
                jnp.where(vm[..., None], out, jnp.asarray(-1e9, out.dtype)), axis=2
            )
            valid = jnp.any(vm, axis=2)
            out = jnp.where(valid[..., None], out, 0.0)
        if self.afms:
            out = AFMS(dtype=self.dtype, name="afms")(out, valid)
        return out, valid


class ECAPALiteEncoder(nn.Module):
    """Repo-original small encoder (kept as the CPU-friendly default)."""

    cfg: SpkConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, valid, train: bool = False):
        cfg = self.cfg
        x = nn.Conv(cfg.hidden, (5,), padding="SAME", dtype=self.dtype, name="conv_in")(feats)
        x = jax.nn.relu(x)
        outs = []
        for i in range(cfg.layers):
            h = nn.Conv(
                cfg.hidden, (3,), kernel_dilation=(2**i,), padding="SAME",
                dtype=self.dtype, name=f"res_{i}",
            )(x)
            h = jax.nn.relu(nn.LayerNorm(dtype=self.dtype, name=f"ln_{i}")(h))
            x = x + h
            outs.append(x)
        x = jnp.concatenate(outs, axis=-1)
        x = jax.nn.relu(nn.Dense(cfg.hidden, dtype=self.dtype, name="proj")(x))
        return jnp.where(valid[..., None], x, 0.0), valid


class EcapaTdnnEncoder(nn.Module):
    """ECAPA-TDNN (encoder/ecapa_tdnn_encoder.py:16)."""

    cfg: SpkConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, valid, train: bool = False):
        cfg = self.cfg
        ndim = cfg.hidden
        out_dim = cfg.encoder_out or 2 * cfg.hidden
        x = nn.Conv(ndim, (5,), padding="SAME", dtype=self.dtype, name="conv")(feats)
        x = _BN(dtype=self.dtype, name="bn")(jax.nn.relu(x), valid, train=train)
        kw = dict(scale=cfg.model_scale, se=True, dtype=self.dtype)
        x1, _ = Res2NetBlock(ndim, 3, 2, name="layer1", **kw)(x, valid, train)
        x2, _ = Res2NetBlock(ndim, 3, 3, name="layer2", **kw)(x + x1, valid, train)
        x3, _ = Res2NetBlock(ndim, 3, 4, name="layer3", **kw)(x + x1 + x2, valid, train)
        x = jnp.concatenate([x1, x2, x3], axis=-1)
        x = jax.nn.relu(nn.Conv(out_dim, (1,), dtype=self.dtype, name="layer4")(x))
        return jnp.where(valid[..., None], x, 0.0), valid


class RawNet3Encoder(nn.Module):
    """RawNet3 (encoder/rawnet3_encoder.py:15): AFMS Bottle2necks with
    time max-pooling; layer3 consumes mp3(x1) + x2."""

    cfg: SpkConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, valid, train: bool = False):
        cfg = self.cfg
        ndim = cfg.hidden
        out_dim = cfg.encoder_out or 2 * cfg.hidden
        kw = dict(scale=cfg.model_scale, afms=True, dtype=self.dtype)
        x1, v1 = Res2NetBlock(ndim, 3, 2, pool=5, name="layer1", **kw)(
            feats, valid, train
        )
        x2, v2 = Res2NetBlock(ndim, 3, 3, pool=3, name="layer2", **kw)(x1, v1, train)
        # mp3(x1): maxpool stride 3 aligns x1 to x2's frame rate
        t = x1.shape[1] // 3 * 3
        x1p = x1[:, :t].reshape(x1.shape[0], -1, 3, ndim)
        v1p = v1[:, :t].reshape(v1.shape[0], -1, 3)
        x1p = jnp.max(
            jnp.where(v1p[..., None], x1p, jnp.asarray(-1e9, x1.dtype)), axis=2
        )
        x1p = jnp.where(jnp.any(v1p, 2)[..., None], x1p, 0.0)
        x3, v3 = Res2NetBlock(ndim, 3, 4, name="layer3", **kw)(x1p + x2, v2, train)
        x = jnp.concatenate([x1p, x2, x3], axis=-1)
        x = jax.nn.relu(nn.Conv(out_dim, (1,), dtype=self.dtype, name="layer4")(x))
        return jnp.where(v3[..., None], x, 0.0), v3


class XvectorEncoder(nn.Module):
    """X-vector TDNN (encoder/xvector_encoder.py:13)."""

    cfg: SpkConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, valid, train: bool = False):
        cfg = self.cfg
        out_dim = cfg.encoder_out or 2 * cfg.hidden
        kernels, dils = (5, 3, 3, 1, 1), (1, 2, 3, 1, 1)
        chans = [cfg.hidden] * 4 + [out_dim]
        x = feats
        for i, (k, d, c) in enumerate(zip(kernels, dils, chans)):
            x = nn.Conv(
                c, (k,), kernel_dilation=(d,), padding="SAME",
                dtype=self.dtype, name=f"conv_{i}",
            )(x)
            x = _BN(dtype=self.dtype, name=f"bn_{i}")(
                jax.nn.relu(x), valid, train=train
            )
        return jnp.where(valid[..., None], x, 0.0), valid


class _SKAttention2d(nn.Module):
    """fw/cw selective-kernel attention over [B, T, F, C]
    (ska_tdnn_encoder.py:196 fwSKAttention / :268 cwSKAttention)."""

    axis: str  # "freq" | "chan"
    kernel_sizes: Tuple[int, ...] = (5, 7)
    reduction: int = 8
    min_d: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid, train: bool = False):
        f, c = x.shape[2], x.shape[3]
        branches = []
        for k in self.kernel_sizes:
            h = nn.Conv(c, (k, k), padding="SAME", dtype=self.dtype, name=f"conv_k{k}")(x)
            h = jax.nn.relu(h)
            h = MaskedBatchNorm(dtype=self.dtype, name=f"bn_k{k}")(
                h.reshape(h.shape[0], h.shape[1], -1), valid,
                use_running_average=not train,
            ).reshape(h.shape)
            branches.append(h)
        u = sum(branches)
        m = valid[:, :, None, None].astype(jnp.float32)
        n = jnp.maximum(jnp.sum(m), 1.0)
        if self.axis == "freq":
            s = jnp.sum(u * m, axis=(1, 3)) / (jnp.sum(m, axis=(1, 3)) * c)  # [B,F]
            width = f
        else:
            s = jnp.sum(u * m, axis=(1, 2)) / (jnp.sum(m, axis=(1, 2)) * f)  # [B,C]
            width = c
        d = max(self.min_d, width // self.reduction)
        z = jax.nn.relu(nn.Dense(d, dtype=self.dtype, name="fc")(s))
        logits = jnp.stack(
            [nn.Dense(width, dtype=self.dtype, name=f"fc_k{k}")(z)
             for k in self.kernel_sizes], 0,
        )
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=0).astype(x.dtype)
        if self.axis == "freq":
            w = w[:, :, None, :, None]  # [K, B, 1, F, 1]
        else:
            w = w[:, :, None, None, :]  # [K, B, 1, 1, C]
        return sum(w[i] * b for i, b in enumerate(branches))


class SkaTdnnEncoder(nn.Module):
    """SKA-TDNN (encoder/ska_tdnn_encoder.py:341): conv2d stride-(2,1) stem
    over [B, T, F, 1], two fcwSKA ResBlocks, stride-(2,2) conv, flatten
    freq x chan, then selective-kernel Res2Net trunk."""

    cfg: SpkConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, valid, train: bool = False):
        cfg = self.cfg
        ndim = cfg.hidden
        out_dim = cfg.encoder_out or 2 * cfg.hidden
        cdim = cfg.ska_dim
        # [B, T, F, 1]; reference layout is [B, C, F, T] — freq halves twice
        x = feats[..., None]
        x = nn.Conv(
            cdim, (3, 3), strides=(1, 2), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="frt_conv1",
        )(x)
        x = MaskedBatchNorm(dtype=self.dtype, name="frt_bn1")(
            jax.nn.relu(x).reshape(x.shape[0], x.shape[1], -1), valid,
            use_running_average=not train,
        ).reshape(x.shape)
        for bi in (1, 2):
            res = x
            h = nn.Conv(
                cdim, (3, 3), padding="SAME", use_bias=False,
                dtype=self.dtype, name=f"frt_block{bi}_conv",
            )(x)
            h = MaskedBatchNorm(dtype=self.dtype, name=f"frt_block{bi}_bn")(
                jax.nn.relu(h).reshape(h.shape[0], h.shape[1], -1), valid,
                use_running_average=not train,
            ).reshape(h.shape)
            h = _SKAttention2d("freq", dtype=self.dtype, name=f"frt_block{bi}_fwska")(
                h, valid, train
            )
            h = _SKAttention2d("chan", dtype=self.dtype, name=f"frt_block{bi}_cwska")(
                h, valid, train
            )
            x = jax.nn.relu(h + res)
        x = nn.Conv(
            cdim, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="frt_conv2",
        )(x)
        # time stride 2: halve the mask too
        valid = valid[:, ::2][:, : x.shape[1]]
        x = MaskedBatchNorm(dtype=self.dtype, name="frt_bn2")(
            jax.nn.relu(x).reshape(x.shape[0], x.shape[1], -1), valid,
            use_running_average=not train,
        ).reshape(x.shape)
        x = x.reshape(x.shape[0], x.shape[1], -1)  # [B, T/2, F/4 * C]
        x = nn.Conv(ndim, (5,), padding="SAME", dtype=self.dtype, name="conv1")(x)
        x = _BN(dtype=self.dtype, name="bn1")(jax.nn.relu(x), valid, train=train)
        kw = dict(scale=cfg.model_scale, sk_kernels=(5, 7), dtype=self.dtype)
        x1, _ = Res2NetBlock(ndim, 3, 2, name="layer1", **kw)(x, valid, train)
        x2, _ = Res2NetBlock(ndim, 3, 3, name="layer2", **kw)(x + x1, valid, train)
        x3, _ = Res2NetBlock(ndim, 3, 4, name="layer3", **kw)(x + x1 + x2, valid, train)
        x = jnp.concatenate([x1, x2, x3], axis=-1)
        x = jax.nn.relu(nn.Conv(out_dim, (1,), dtype=self.dtype, name="layer4")(x))
        return jnp.where(valid[..., None], x, 0.0), valid


_ENCODERS = {
    "ecapa_lite": ECAPALiteEncoder,
    "ecapa": EcapaTdnnEncoder,
    "rawnet3": RawNet3Encoder,
    "xvector": XvectorEncoder,
    "ska_tdnn": SkaTdnnEncoder,
}


class AttentiveStatsPooling(nn.Module):
    """Repo-original attentive stats pooling (default ``attn_stat``)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
        """[B, T, D] -> [B, 2D] attention-weighted mean || std."""
        h = jnp.tanh(nn.Dense(x.shape[-1] // 2, dtype=self.dtype, name="attn_1")(x))
        w = nn.Dense(x.shape[-1], dtype=self.dtype, name="attn_2")(h)  # [B, T, D]
        w = jnp.where(valid[..., None], w, -1e9)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=1)
        mean = jnp.sum(w * x, axis=1)
        var = jnp.sum(w * (x - mean[:, None, :]) ** 2, axis=1)
        std = jnp.sqrt(jnp.clip(var, 1e-7, None))
        return jnp.concatenate([mean, std], axis=-1)


class ChnAttnStatPooling(nn.Module):
    """ECAPA channel-attentive statistics pooling
    (pooling/chn_attn_stat_pooling.py:8): attention conditioned on the
    global context [x, mean, std]."""

    bottleneck: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid, train: bool = False):
        t = x.shape[1]
        mean, std = masked_mean_std(x, valid)
        g = jnp.concatenate(
            [x, jnp.broadcast_to(mean[:, None], x.shape),
             jnp.broadcast_to(std[:, None], x.shape)], axis=-1,
        )
        h = nn.Conv(self.bottleneck, (1,), dtype=self.dtype, name="attn_1")(g)
        h = _BN(dtype=self.dtype, name="attn_bn")(jax.nn.relu(h), valid, train=train)
        w = nn.Conv(x.shape[-1], (1,), dtype=self.dtype, name="attn_2")(h)
        w = jnp.where(valid[..., None], w, -jnp.inf)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=1)
        mu = jnp.sum(x * w, axis=1)
        sg = jnp.sqrt(jnp.clip(jnp.sum((x**2) * w, axis=1) - mu**2, 1e-4, 1e4))
        return jnp.concatenate([mu, sg], axis=-1)


class SpkProjector(nn.Module):
    """Projector registry (spk/projector/)."""

    kind: str
    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind in ("dense",):
            return nn.Dense(self.embed_dim, dtype=self.dtype, name="fc")(x)
        if self.kind == "rawnet3":
            x = _BN(dtype=self.dtype, name="bn")(x, train=train)
            return nn.Dense(self.embed_dim, dtype=self.dtype, name="fc")(x)
        if self.kind == "xvector":
            h = jax.nn.relu(nn.Dense(self.embed_dim, dtype=self.dtype, name="fc1")(x))
            return nn.Dense(self.embed_dim, dtype=self.dtype, name="fc2")(h)
        if self.kind == "ska":
            x = _BN(dtype=self.dtype, name="bn")(x, train=train)
            x = nn.Dense(self.embed_dim, dtype=self.dtype, name="fc")(x)
            return _BN(dtype=self.dtype, name="bn2")(x, train=train)
        raise ValueError(f"unknown projector: {self.kind}")


def aam_softmax_loss(
    embeddings: jnp.ndarray,  # [B, E] (unnormalized)
    weight: jnp.ndarray,  # [E, C] class prototypes
    labels: jnp.ndarray,  # [B]
    margin: float = 0.2,
    scale: float = 30.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ArcFace additive-angular-margin softmax (spk/loss/aamsoftmax.py)."""
    e = embeddings / jnp.linalg.norm(embeddings, axis=-1, keepdims=True)
    w = weight / jnp.linalg.norm(weight, axis=0, keepdims=True)
    cos = jnp.clip(e @ w, -1.0 + 1e-7, 1.0 - 1e-7)  # [B, C]
    theta = jnp.arccos(cos)
    onehot = jax.nn.one_hot(labels, cos.shape[-1])
    cos_m = jnp.cos(theta + margin)
    logits = scale * jnp.where(onehot > 0, cos_m, cos)
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.mean(jnp.sum(onehot * logp, axis=-1))
    acc = jnp.mean((jnp.argmax(cos, axis=-1) == labels).astype(jnp.float32))
    return loss, acc


def aam_subcenter_intertopk_loss(
    embeddings: jnp.ndarray,  # [B, E]
    weight: jnp.ndarray,  # [E, K*C] sub-center prototypes
    labels: jnp.ndarray,  # [B]
    n_classes: int,
    margin: float = 0.2,
    scale: float = 32.0,
    k_top: int = 5,
    mp: float = 0.06,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sub-center AAM with inter-top-k penalty
    (spk/loss/aamsoftmax_subcenter_intertopk.py:102-144).

    cos to each of K sub-centers per class, max over K; the target gets the
    usual additive angular margin; the k_top hardest non-target classes get
    an *attracting* margin penalty (cos(theta - mp)) that pushes them apart.
    """
    e = embeddings / jnp.linalg.norm(embeddings, axis=-1, keepdims=True)
    w = weight / jnp.linalg.norm(weight, axis=0, keepdims=True)
    cos = (e @ w).reshape(e.shape[0], n_classes, -1).max(axis=-1)  # [B, C]
    cos = jnp.clip(cos, -1.0 + 1e-7, 1.0 - 1e-7)
    sin = jnp.sqrt(1.0 - cos**2)
    cos_m, sin_m = math.cos(margin), math.sin(margin)
    # hard-sample margin scales with the training margin (reference .update)
    mp_eff = mp * (margin / 0.2) if margin > 1e-3 else 0.0
    cos_mp, sin_mp = math.cos(mp_eff), math.sin(mp_eff)
    th = math.cos(math.pi - margin)
    mmm = 1.0 + math.cos(math.pi - margin)
    phi = cos * cos_m - sin * sin_m
    phi = jnp.where(cos > th, phi, cos - mmm)
    phi_mp = cos * cos_mp + sin * sin_mp
    onehot = jax.nn.one_hot(labels, n_classes)
    if k_top > 0:
        _, idx = jax.lax.top_k(cos - 2 * onehot, k_top)  # exclude the target
        topk_onehot = jnp.sum(jax.nn.one_hot(idx, n_classes), axis=1)
        logits = (
            onehot * phi + topk_onehot * phi_mp
            + (1.0 - onehot - topk_onehot) * cos
        )
    else:
        logits = onehot * phi + (1.0 - onehot) * cos
    logp = jax.nn.log_softmax(scale * logits, axis=-1)
    loss = -jnp.mean(jnp.sum(onehot * logp, axis=-1))
    acc = jnp.mean((jnp.argmax(cos, axis=-1) == labels).astype(jnp.float32))
    return loss, acc


class SpeakerModel(nn.Module):
    """spk/espnet_model.py analog: forward(speech, lens, spk_labels) -> loss."""

    cfg: SpkConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        enc_cls = _ENCODERS.get(cfg.encoder)
        if enc_cls is None and cfg.encoder != "identity":
            raise ValueError(f"unknown spk encoder: {cfg.encoder}")
        self.encoder = (
            enc_cls(cfg, dtype=self.dtype, name="encoder") if enc_cls else None
        )
        if cfg.pooling == "attn_stat":
            self.pooling = AttentiveStatsPooling(dtype=self.dtype, name="pooling")
        elif cfg.pooling == "chn_attn_stat":
            self.pooling = ChnAttnStatPooling(dtype=self.dtype, name="pooling")
        elif cfg.pooling in ("stats", "mean"):
            self.pooling = None
        else:
            raise ValueError(f"unknown spk pooling: {cfg.pooling}")
        self.projector = SpkProjector(
            cfg.projector, cfg.embed_dim, dtype=self.dtype, name="projector"
        )
        n_proto = cfg.n_speakers * (
            cfg.subcenter_k if cfg.loss == "aamsoftmax_sc_itk" else 1
        )
        self.aam_weight = self.param(
            "aam_weight",
            nn.initializers.xavier_uniform(),
            (cfg.embed_dim, n_proto),
        )

    def extract_embedding(self, speech, speech_lengths, deterministic: bool = True):
        f = self.cfg.frontend
        feats, feats_lengths = default_frontend(
            speech, speech_lengths, fs=f.fs, n_fft=f.n_fft, hop_length=f.hop_length,
            n_mels=f.n_mels,
        )
        valid = make_valid_mask(feats_lengths, feats.shape[1])
        train = not deterministic
        x = feats.astype(self.dtype)
        if self.encoder is not None:
            x, valid = self.encoder(x, valid, train)
        if self.pooling is not None:
            args = (x, valid) if self.cfg.pooling == "attn_stat" else (x, valid, train)
            pooled = self.pooling(*args)
        elif self.cfg.pooling == "stats":
            pooled = jnp.concatenate(masked_mean_std(x, valid), axis=-1)
        else:  # mean
            pooled = masked_mean(x, valid)
        return self.projector(pooled, train)

    def __call__(
        self,
        speech: jnp.ndarray,
        speech_lengths: jnp.ndarray,
        spk_labels: jnp.ndarray,  # [B] int
        spk_labels_lengths: Optional[jnp.ndarray] = None,  # collate artifact, unused
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        emb = self.extract_embedding(speech, speech_lengths, deterministic)
        labels = spk_labels.reshape(-1)[: speech.shape[0]]
        if self.cfg.loss == "aamsoftmax_sc_itk":
            loss, acc = aam_subcenter_intertopk_loss(
                emb, self.aam_weight, labels, self.cfg.n_speakers,
                self.cfg.aam_margin, self.cfg.aam_scale,
                self.cfg.inter_topk, self.cfg.inter_topk_penalty,
            )
        else:
            loss, acc = aam_softmax_loss(
                emb, self.aam_weight, labels, self.cfg.aam_margin, self.cfg.aam_scale
            )
        stats = {"loss": loss, "acc": acc}
        return loss, stats, jnp.asarray(speech.shape[0], jnp.float32)


def cosine_score(emb1: jnp.ndarray, emb2: jnp.ndarray) -> jnp.ndarray:
    """Verification trial score (spk_inference)."""
    a = emb1 / jnp.linalg.norm(emb1, axis=-1, keepdims=True)
    b = emb2 / jnp.linalg.norm(emb2, axis=-1, keepdims=True)
    return jnp.sum(a * b, axis=-1)
