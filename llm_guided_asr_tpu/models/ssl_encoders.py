"""Pretrained SSL / Whisper encoder import (HF-weight-compatible flax ports).

Rebuild of the reference's pretrained-encoder surface (VERDICT missing #6):
espnet2/asr/encoder/wav2vec2_encoder.py (FairSeqWav2Vec2Encoder),
hubert_encoder.py (TorchAudioHuBERTPretrainEncoder / FairseqHubertEncoder),
whisper_encoder.py (OpenAIWhisperEncoder) and frontend/s3prl.py — here a
single flax module family whose parameter tree maps 1:1 onto HuggingFace
``Wav2Vec2Model`` / ``HubertModel`` / ``WhisperModel.encoder`` state dicts,
so public pretrained checkpoints load directly and the outputs match the
torch reference (tests/test_pretrained_encoders.py).

TPU notes: the conv feature extractor and all attention/FFN blocks are plain
dense/conv ops that tile the MXU; weight-norm on the positional conv is
folded into a single materialized weight at conversion time (no runtime
reparametrization).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


# ---------------------------------------------------------------------------
# wav2vec2 / HuBERT
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class W2VConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"  # 'group' (base) | 'layer' (large)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    do_stable_layer_norm: bool = False  # False: post-norm (base); True: pre-norm
    layer_norm_eps: float = 1e-5

    @classmethod
    def from_hf_config(cls, hf) -> "W2VConfig":
        return cls(
            hidden_size=hf.hidden_size,
            num_hidden_layers=hf.num_hidden_layers,
            num_attention_heads=hf.num_attention_heads,
            intermediate_size=hf.intermediate_size,
            conv_dim=tuple(hf.conv_dim),
            conv_kernel=tuple(hf.conv_kernel),
            conv_stride=tuple(hf.conv_stride),
            conv_bias=hf.conv_bias,
            feat_extract_norm=hf.feat_extract_norm,
            num_conv_pos_embeddings=hf.num_conv_pos_embeddings,
            num_conv_pos_embedding_groups=hf.num_conv_pos_embedding_groups,
            do_stable_layer_norm=hf.do_stable_layer_norm,
            layer_norm_eps=hf.layer_norm_eps,
        )

    def out_lengths(self, lengths: jnp.ndarray) -> jnp.ndarray:
        for k, s in zip(self.conv_kernel, self.conv_stride):
            lengths = (lengths - k) // s + 1
        return jnp.maximum(lengths, 0)


class _W2VFeatureExtractor(nn.Module):
    cfg: W2VConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, speech: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = speech[..., None]  # [B, N, 1]
        for i, (c, k, s) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)):
            x = nn.Conv(
                c, (k,), strides=(s,), padding="VALID", use_bias=cfg.conv_bias,
                dtype=self.dtype, name=f"conv_layers_{i}_conv",
            )(x)
            if cfg.feat_extract_norm == "group" and i == 0:
                x = nn.GroupNorm(
                    num_groups=c, epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                    name="conv_layers_0_layer_norm",
                )(x)
            elif cfg.feat_extract_norm == "layer":
                x = nn.LayerNorm(
                    epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                    name=f"conv_layers_{i}_layer_norm",
                )(x)
            x = jax.nn.gelu(x, approximate=False)
        return x


class _W2VAttention(nn.Module):
    cfg: W2VConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid):
        cfg = self.cfg
        h = cfg.num_attention_heads
        d = cfg.hidden_size
        hd = d // h
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(x) * (hd ** -0.5)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(x)
        b, t, _ = x.shape
        q, k, v = (z.reshape(b, t, h, hd) for z in (q, k, v))
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        scores = jnp.where(valid[:, None, None, :], scores, -1e10)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class _W2VLayer(nn.Module):
    cfg: W2VConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid):
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name=name)
        attn = _W2VAttention(cfg, dtype=self.dtype, name="attention")

        def ff(z):
            z = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                         name="feed_forward_intermediate_dense")(z)
            z = jax.nn.gelu(z, approximate=False)
            return nn.Dense(cfg.hidden_size, dtype=self.dtype,
                            name="feed_forward_output_dense")(z)

        if cfg.do_stable_layer_norm:  # pre-norm (large models)
            x = x + attn(ln("layer_norm")(x), valid)
            x = x + ff(ln("final_layer_norm")(x))
        else:  # post-norm (base models)
            x = ln("layer_norm")(x + attn(x, valid))
            x = ln("final_layer_norm")(x + ff(x))
        return x


class Wav2Vec2Encoder(nn.Module):
    """HF Wav2Vec2Model / HubertModel forward (eval mode), flax.

    [B, N] raw 16 kHz audio -> ([B, T, hidden], [B] lengths).
    """

    cfg: W2VConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, speech, speech_lengths, deterministic: bool = True):
        cfg = self.cfg
        x = _W2VFeatureExtractor(cfg, dtype=self.dtype, name="feature_extractor")(
            speech.astype(self.dtype)
        )
        lengths = jnp.minimum(cfg.out_lengths(speech_lengths), x.shape[1])
        valid = make_valid_mask(lengths, x.shape[1])
        # feature projection
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="feature_projection_layer_norm")(x)
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                     name="feature_projection_projection")(x)
        # HF zeroes padded positions before the encoder
        x = jnp.where(valid[..., None], x, 0.0)
        # positional conv embedding (weight-norm folded at conversion)
        k = cfg.num_conv_pos_embeddings
        pos = nn.Conv(
            cfg.hidden_size, (k,), padding=[(k // 2, k // 2)],
            feature_group_count=cfg.num_conv_pos_embedding_groups,
            dtype=self.dtype, name="pos_conv_embed_conv",
        )(x)
        if k % 2 == 0:
            pos = pos[:, :-1]
        x = x + jax.nn.gelu(pos, approximate=False)
        if not cfg.do_stable_layer_norm:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                             name="encoder_layer_norm")(x)
        for i in range(cfg.num_hidden_layers):
            x = _W2VLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x, valid)
        if cfg.do_stable_layer_norm:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                             name="encoder_layer_norm")(x)
        return jnp.where(valid[..., None], x, 0.0), lengths


def _np(t):
    return np.asarray(t.detach().float().numpy() if hasattr(t, "detach") else t, np.float32)


def _weight_norm_conv(sd: Dict, prefix: str) -> np.ndarray:
    """Materialize a torch weight-norm conv weight (dim=2) from either the
    legacy (weight_g/weight_v) or parametrize (original0/original1) layout."""
    if f"{prefix}.weight_g" in sd:
        g, v = _np(sd[f"{prefix}.weight_g"]), _np(sd[f"{prefix}.weight_v"])
    else:
        g = _np(sd[f"{prefix}.parametrizations.weight.original0"])
        v = _np(sd[f"{prefix}.parametrizations.weight.original1"])
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def convert_hf_wav2vec2_state_dict(sd: Dict, cfg: W2VConfig) -> Dict:
    """HF Wav2Vec2Model/HubertModel state_dict -> flax params for
    :class:`Wav2Vec2Encoder`.  torch Conv1d weights are [out, in, k] ->
    flax [k, in, out]; Dense [out, in] -> [in, out]."""
    sd = {k: v for k, v in sd.items()}

    def conv_w(name):
        return _np(sd[name]).transpose(2, 1, 0)

    def dense(dst, src):
        p = {"kernel": _np(sd[f"{src}.weight"]).T}
        if f"{src}.bias" in sd:
            p["bias"] = _np(sd[f"{src}.bias"])
        return {dst: p}

    def ln(dst, src):
        return {dst: {"scale": _np(sd[f"{src}.weight"]), "bias": _np(sd[f"{src}.bias"])}}

    fe: Dict[str, Any] = {}
    for i in range(len(cfg.conv_dim)):
        cp = {"kernel": conv_w(f"feature_extractor.conv_layers.{i}.conv.weight")}
        if f"feature_extractor.conv_layers.{i}.conv.bias" in sd:
            cp["bias"] = _np(sd[f"feature_extractor.conv_layers.{i}.conv.bias"])
        fe[f"conv_layers_{i}_conv"] = cp
        ln_key = f"feature_extractor.conv_layers.{i}.layer_norm"
        if f"{ln_key}.weight" in sd:
            fe[f"conv_layers_{i}_layer_norm"] = {
                "scale": _np(sd[f"{ln_key}.weight"]),
                "bias": _np(sd[f"{ln_key}.bias"]),
            }
    p: Dict[str, Any] = {"feature_extractor": fe}
    p.update(ln("feature_projection_layer_norm", "feature_projection.layer_norm"))
    p.update(dense("feature_projection_projection", "feature_projection.projection"))
    pos_w = _weight_norm_conv(sd, "encoder.pos_conv_embed.conv").transpose(2, 1, 0)
    p["pos_conv_embed_conv"] = {
        "kernel": pos_w,
        "bias": _np(sd["encoder.pos_conv_embed.conv.bias"]),
    }
    p.update(ln("encoder_layer_norm", "encoder.layer_norm"))
    for i in range(cfg.num_hidden_layers):
        lp: Dict[str, Any] = {}
        base = f"encoder.layers.{i}"
        att = {}
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            att.update(dense(proj, f"{base}.attention.{proj}"))
        lp["attention"] = att
        lp.update(ln("layer_norm", f"{base}.layer_norm"))
        lp.update(dense("feed_forward_intermediate_dense", f"{base}.feed_forward.intermediate_dense"))
        lp.update(dense("feed_forward_output_dense", f"{base}.feed_forward.output_dense"))
        lp.update(ln("final_layer_norm", f"{base}.final_layer_norm"))
        p[f"layers_{i}"] = lp
    return p


# ---------------------------------------------------------------------------
# Whisper encoder
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class WhisperEncConfig:
    d_model: int = 384
    encoder_layers: int = 4
    encoder_attention_heads: int = 6
    encoder_ffn_dim: int = 1536
    num_mel_bins: int = 80
    max_source_positions: int = 1500

    @classmethod
    def from_hf_config(cls, hf) -> "WhisperEncConfig":
        return cls(
            d_model=hf.d_model,
            encoder_layers=hf.encoder_layers,
            encoder_attention_heads=hf.encoder_attention_heads,
            encoder_ffn_dim=hf.encoder_ffn_dim,
            num_mel_bins=hf.num_mel_bins,
            max_source_positions=hf.max_source_positions,
        )


class _WhisperAttention(nn.Module):
    cfg: WhisperEncConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid):
        cfg = self.cfg
        h = cfg.encoder_attention_heads
        d = cfg.d_model
        hd = d // h
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(x) * (hd ** -0.5)
        k = nn.Dense(d, use_bias=False, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(x)
        b, t, _ = x.shape
        q, k, v = (z.reshape(b, t, h, hd) for z in (q, k, v))
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        scores = jnp.where(valid[:, None, None, :], scores, -1e10)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class WhisperEncoder(nn.Module):
    """HF WhisperModel.encoder forward (eval), flax: [B, T, n_mels] -> [B, T//2, d].

    (Takes mel frames time-major like the rest of this framework; HF takes
    [B, n_mels, T] — the converter handles the conv weight layout.)
    """

    cfg: WhisperEncConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, feats_lengths, deterministic: bool = True):
        cfg = self.cfg
        x = nn.Conv(cfg.d_model, (3,), padding=[(1, 1)], dtype=self.dtype, name="conv1")(feats)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Conv(cfg.d_model, (3,), strides=(2,), padding=[(1, 1)], dtype=self.dtype, name="conv2")(x)
        x = jax.nn.gelu(x, approximate=False)
        out_lengths = (feats_lengths + 1) // 2
        t = x.shape[1]
        pos = self.param(
            "embed_positions",
            nn.initializers.normal(0.02),
            (cfg.max_source_positions, cfg.d_model),
        )
        x = x + pos[:t][None].astype(self.dtype)
        valid = make_valid_mask(out_lengths, t)
        for i in range(cfg.encoder_layers):
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"layers_{i}_self_attn_layer_norm")(x)
            x = x + _WhisperAttention(cfg, dtype=self.dtype, name=f"layers_{i}_self_attn")(y, valid)
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"layers_{i}_final_layer_norm")(x)
            y = nn.Dense(cfg.encoder_ffn_dim, dtype=self.dtype, name=f"layers_{i}_fc1")(y)
            y = jax.nn.gelu(y, approximate=False)
            x = x + nn.Dense(cfg.d_model, dtype=self.dtype, name=f"layers_{i}_fc2")(y)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(x)
        return jnp.where(valid[..., None], x, 0.0), out_lengths


def convert_hf_whisper_encoder_state_dict(sd: Dict, cfg: WhisperEncConfig) -> Dict:
    """HF WhisperModel.encoder (or full model with 'encoder.' prefix) ->
    flax params for :class:`WhisperEncoder`."""
    if any(k.startswith("encoder.") for k in sd):
        sd = {k[len("encoder."):]: v for k, v in sd.items() if k.startswith("encoder.")}

    def dense(src, bias=True):
        p = {"kernel": _np(sd[f"{src}.weight"]).T}
        if bias and f"{src}.bias" in sd:
            p["bias"] = _np(sd[f"{src}.bias"])
        return p

    def ln(src):
        return {"scale": _np(sd[f"{src}.weight"]), "bias": _np(sd[f"{src}.bias"])}

    p: Dict[str, Any] = {
        "conv1": {"kernel": _np(sd["conv1.weight"]).transpose(2, 1, 0),
                  "bias": _np(sd["conv1.bias"])},
        "conv2": {"kernel": _np(sd["conv2.weight"]).transpose(2, 1, 0),
                  "bias": _np(sd["conv2.bias"])},
        "embed_positions": _np(sd["embed_positions.weight"]),
        "layer_norm": ln("layer_norm"),
    }
    for i in range(cfg.encoder_layers):
        base = f"layers.{i}"
        p[f"layers_{i}_self_attn"] = {
            "q_proj": dense(f"{base}.self_attn.q_proj"),
            "k_proj": dense(f"{base}.self_attn.k_proj", bias=False),
            "v_proj": dense(f"{base}.self_attn.v_proj"),
            "out_proj": dense(f"{base}.self_attn.out_proj"),
        }
        p[f"layers_{i}_self_attn_layer_norm"] = ln(f"{base}.self_attn_layer_norm")
        p[f"layers_{i}_fc1"] = dense(f"{base}.fc1")
        p[f"layers_{i}_fc2"] = dense(f"{base}.fc2")
        p[f"layers_{i}_final_layer_norm"] = ln(f"{base}.final_layer_norm")
    return p


class SSLEncoderWrapper(nn.Module):
    """Pretrained encoder + Linear to the model dimension, as an ASR encoder.

    Mirrors the reference wrappers (wav2vec2_encoder.py:121 output_layer,
    hubert_encoder.py LinearProjection): wav2vec2/hubert consume the raw
    waveform (frontend: none), whisper consumes mel frames.
    """

    kind: str  # 'wav2vec2' | 'hubert' | 'whisper'
    ssl_cfg: Any  # W2VConfig | WhisperEncConfig
    output_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, feats_lengths, deterministic: bool = True):
        if self.kind in ("wav2vec2", "hubert"):
            inner = Wav2Vec2Encoder(self.ssl_cfg, dtype=self.dtype, name="ssl")
        else:
            inner = WhisperEncoder(self.ssl_cfg, dtype=self.dtype, name="ssl")
        x, out_lengths = inner(feats, feats_lengths, deterministic)
        x = nn.Dense(self.output_size, dtype=self.dtype, name="output_proj")(x)
        valid = make_valid_mask(out_lengths, x.shape[1])
        return jnp.where(valid[..., None], x, 0.0), out_lengths


# ---------------------------------------------------------------------------
# loading helpers (tasks/asr.py injects at params['encoder']['ssl'])
# ---------------------------------------------------------------------------

def load_pretrained_encoder(name_or_path: str, kind: str):
    """(flax module config, converted params) for a pretrained HF encoder.

    kind: 'wav2vec2' | 'hubert' | 'whisper'.
    """
    if kind in ("wav2vec2", "hubert"):
        from transformers import AutoConfig, AutoModel

        hf_cfg = AutoConfig.from_pretrained(name_or_path)
        model = AutoModel.from_pretrained(name_or_path)
        cfg = W2VConfig.from_hf_config(hf_cfg)
        params = convert_hf_wav2vec2_state_dict(model.state_dict(), cfg)
        return cfg, params
    if kind == "whisper":
        from transformers import AutoConfig, WhisperModel

        hf_cfg = AutoConfig.from_pretrained(name_or_path)
        model = WhisperModel.from_pretrained(name_or_path)
        cfg = WhisperEncConfig.from_hf_config(hf_cfg)
        params = convert_hf_whisper_encoder_state_dict(
            model.encoder.state_dict(), cfg
        )
        return cfg, params
    raise ValueError(f"unknown pretrained encoder kind {kind!r}")
