"""Whisper encoder-decoder ASR with HF weight import.

Rebuild of the reference's Whisper surface (espnet2/asr/encoder/
whisper_encoder.py OpenAIWhisperEncoder + decoder/whisper_decoder.py
OpenAIWhisperDecoder): a faithful flax port of ``WhisperModel`` whose
parameter tree maps 1:1 onto the HF state dict, so public whisper-tiny..-
large checkpoints load directly.  The decoder exposes the framework's
``decoder_logits`` contract, so the standard on-device BatchBeamSearch
(CTC-less mode) drives it unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from llm_guided_asr_tpu.models.ssl_encoders import (
    WhisperEncConfig,
    WhisperEncoder,
    _np,
    convert_hf_whisper_encoder_state_dict,
)
from llm_guided_asr_tpu.utils.masks import causal_attn_mask, make_valid_mask

Dtype = Any


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    vocab_size: int = 51865
    d_model: int = 384
    decoder_layers: int = 4
    decoder_attention_heads: int = 6
    decoder_ffn_dim: int = 1536
    max_target_positions: int = 448
    encoder: WhisperEncConfig = WhisperEncConfig()
    # fine-tune path (the reference fine-tunes whisper by mounting
    # OpenAIWhisperEncoder/Decoder inside ESPnetASRModel, tasks/asr.py
    # encoder=whisper + decoder=whisper; attention CE only — no CTC head):
    sot_id: int = 50258          # <|startoftranscript|>
    eot_id: int = 50257          # <|endoftext|>
    lsm_weight: float = 0.1
    ignore_id: int = -1

    @classmethod
    def from_hf_config(cls, hf) -> "WhisperConfig":
        return cls(
            vocab_size=hf.vocab_size,
            d_model=hf.d_model,
            decoder_layers=hf.decoder_layers,
            decoder_attention_heads=hf.decoder_attention_heads,
            decoder_ffn_dim=hf.decoder_ffn_dim,
            max_target_positions=hf.max_target_positions,
            encoder=WhisperEncConfig.from_hf_config(hf),
        )


class _WhisperDecAttention(nn.Module):
    cfg: WhisperConfig
    causal: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, kv, kv_valid):
        cfg = self.cfg
        h = cfg.decoder_attention_heads
        d = cfg.d_model
        hd = d // h
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(x) * (hd ** -0.5)
        k = nn.Dense(d, use_bias=False, dtype=self.dtype, name="k_proj")(kv)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(kv)
        b, tq, _ = x.shape
        tk = kv.shape[1]
        q = q.reshape(b, tq, h, hd)
        k = k.reshape(b, tk, h, hd)
        v = v.reshape(b, tk, h, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        mask = kv_valid if kv_valid.ndim == 3 else kv_valid[:, None, :]
        scores = jnp.where(mask[:, None], scores, -1e10)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, tq, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class WhisperDecoder(nn.Module):
    """HF WhisperDecoder forward (eval), flax; logits over the whisper vocab."""

    cfg: WhisperConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        enc: jnp.ndarray,  # [B, T, d]
        enc_lengths: jnp.ndarray,
        ys: jnp.ndarray,  # [B, L] token ids
        ys_lengths: jnp.ndarray,
    ) -> jnp.ndarray:
        cfg = self.cfg
        b, l = ys.shape
        embed = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=self.dtype,
                         name="embed_tokens")
        pos = self.param(
            "embed_positions",
            nn.initializers.normal(0.02),
            (cfg.max_target_positions, cfg.d_model),
        )
        x = embed(jnp.clip(ys, 0, cfg.vocab_size - 1)) + pos[:l][None].astype(self.dtype)
        self_mask = causal_attn_mask(ys_lengths, l)
        enc_valid = make_valid_mask(enc_lengths, enc.shape[1])
        for i in range(cfg.decoder_layers):
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"layers_{i}_self_attn_layer_norm")(x)
            x = x + _WhisperDecAttention(cfg, causal=True, dtype=self.dtype,
                                         name=f"layers_{i}_self_attn")(y, y, self_mask)
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name=f"layers_{i}_encoder_attn_layer_norm")(x)
            x = x + _WhisperDecAttention(cfg, dtype=self.dtype,
                                         name=f"layers_{i}_encoder_attn")(y, enc, enc_valid)
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"layers_{i}_final_layer_norm")(x)
            y = nn.Dense(cfg.decoder_ffn_dim, dtype=self.dtype, name=f"layers_{i}_fc1")(y)
            y = jax.nn.gelu(y, approximate=False)
            x = x + nn.Dense(cfg.d_model, dtype=self.dtype, name=f"layers_{i}_fc2")(y)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(x)
        return embed.attend(x)  # tied proj_out


class WhisperASR(nn.Module):
    """Full pretrained Whisper as an ASR model for the on-device beam search.

    ``encode`` consumes log-mel features [B, T, n_mels] (whisper's own
    mel frontend convention: 16 kHz, hop 160, 80 mels); ``decoder_logits``
    follows the framework scorer contract so BatchBeamSearch(ctc_weight=0)
    decodes it directly (whisper has no CTC head).
    """

    cfg: WhisperConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = WhisperEncoder(self.cfg.encoder, dtype=self.dtype, name="encoder")
        self.decoder = WhisperDecoder(self.cfg, dtype=self.dtype, name="decoder")

    def encode(self, feats, feats_lengths, deterministic: bool = True):
        return self.encoder(feats, feats_lengths, deterministic)

    def decoder_logits(self, enc, enc_lengths, ys, ys_lengths,
                       deterministic: bool = True, only_last: bool = False):
        logits = self.decoder(enc, enc_lengths, ys, ys_lengths)
        if only_last:
            k = ys.shape[0]
            return logits[jnp.arange(k), ys_lengths - 1]
        return logits

    def encode_speech(self, speech, speech_lengths, deterministic: bool = True):
        """Raw 16 kHz waveform -> whisper mel frontend -> encoder."""
        from llm_guided_asr_tpu.ops.frontend import whisper_frontend

        feats, flens = whisper_frontend(
            speech, speech_lengths, n_mels=self.cfg.encoder.num_mel_bins
        )
        return self.encode(feats.astype(self.dtype), flens, deterministic)

    def __call__(
        self,
        speech: jnp.ndarray,        # [B, S] raw 16 kHz audio
        speech_lengths: jnp.ndarray,
        text: jnp.ndarray,          # [B, L] whisper-vocab ids, padded -1
        text_lengths: jnp.ndarray,
        deterministic: bool = True,
    ):
        """Fine-tune forward: label-smoothed CE on [sot] y [eot] teacher
        forcing (reference: whisper modules inside ESPnetASRModel,
        espnet2/asr/espnet_model.py attention branch with ctc_weight=0 —
        whisper has no CTC head)."""
        from llm_guided_asr_tpu.ops.losses import (
            accuracy,
            add_sos_eos,
            label_smoothing_loss,
        )

        cfg = self.cfg
        enc, enc_lens = self.encode_speech(speech, speech_lengths,
                                           deterministic)
        ys_in, ys_out = add_sos_eos(
            text, text_lengths, cfg.sot_id, cfg.eot_id, cfg.ignore_id
        )
        logits = self.decoder(enc, enc_lens, ys_in, text_lengths + 1)
        loss = label_smoothing_loss(logits, ys_out, cfg.lsm_weight,
                                    cfg.ignore_id)
        stats = {"loss": loss, "acc": accuracy(logits, ys_out, cfg.ignore_id)}
        return loss, stats, jnp.asarray(speech.shape[0], jnp.float32)

    def collect_feats(self, speech, speech_lengths, *a, **k):
        from llm_guided_asr_tpu.ops.frontend import whisper_frontend

        feats, flens = whisper_frontend(
            speech, speech_lengths, n_mels=self.cfg.encoder.num_mel_bins
        )
        return {"feats": feats, "feats_lengths": flens}


def convert_hf_whisper_state_dict(sd: Dict, cfg: WhisperConfig) -> Dict:
    """HF WhisperModel (or WhisperForConditionalGeneration) state_dict ->
    flax params for :class:`WhisperASR`."""
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}
    enc_sd = {k[len("encoder."):]: v for k, v in sd.items() if k.startswith("encoder.")}
    dec_sd = {k[len("decoder."):]: v for k, v in sd.items() if k.startswith("decoder.")}

    def dense(src, bias=True):
        p = {"kernel": _np(dec_sd[f"{src}.weight"]).T}
        if bias and f"{src}.bias" in dec_sd:
            p["bias"] = _np(dec_sd[f"{src}.bias"])
        return p

    def ln(src):
        return {"scale": _np(dec_sd[f"{src}.weight"]), "bias": _np(dec_sd[f"{src}.bias"])}

    dec: Dict[str, Any] = {
        "embed_tokens": {"embedding": _np(dec_sd["embed_tokens.weight"])},
        "embed_positions": _np(dec_sd["embed_positions.weight"]),
        "layer_norm": ln("layer_norm"),
    }
    for i in range(cfg.decoder_layers):
        base = f"layers.{i}"
        for attn in ("self_attn", "encoder_attn"):
            dec[f"layers_{i}_{attn}"] = {
                "q_proj": dense(f"{base}.{attn}.q_proj"),
                "k_proj": dense(f"{base}.{attn}.k_proj", bias=False),
                "v_proj": dense(f"{base}.{attn}.v_proj"),
                "out_proj": dense(f"{base}.{attn}.out_proj"),
            }
            dec[f"layers_{i}_{attn}_layer_norm"] = ln(f"{base}.{attn}_layer_norm")
        dec[f"layers_{i}_fc1"] = dense(f"{base}.fc1")
        dec[f"layers_{i}_fc2"] = dense(f"{base}.fc2")
        dec[f"layers_{i}_final_layer_norm"] = ln(f"{base}.final_layer_norm")
    return {
        "encoder": convert_hf_whisper_encoder_state_dict(enc_sd, cfg.encoder),
        "decoder": dec,
    }


def load_whisper_asr(name_or_path: str, dtype=jnp.float32):
    """(WhisperASR module, {'params': ...}, hf config) from an HF checkpoint."""
    from transformers import AutoConfig, WhisperModel

    hf_cfg = AutoConfig.from_pretrained(name_or_path)
    model = WhisperModel.from_pretrained(name_or_path)
    cfg = WhisperConfig.from_hf_config(hf_cfg)
    params = convert_hf_whisper_state_dict(model.state_dict(), cfg)
    return WhisperASR(cfg, dtype=dtype), {"params": params}, hf_cfg
