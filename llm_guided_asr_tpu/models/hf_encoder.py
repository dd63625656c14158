"""Hugging Face transformers encoder / postencoder (BERT-family).

TPU-native rebuild of
- espnet2/asr/encoder/hugging_face_transformers_encoder.py (token-id
  encoder for MT/SLU: optional lang-token prepend, attention-masked body)
- espnet2/asr/postencoder/hugging_face_transformers_postencoder.py
  (acoustic postencoder: length-adaptor strided convs -> linear_in ->
  pretrained transformer body over hidden_states)

The transformer body is a flax post-LN bidirectional encoder matching the
BERT/RoBERTa computation exactly (attention -> add&LN -> GELU FFN ->
add&LN), with per-tensor weight ingestion from a torch state_dict
(convert_hf_bert_weights) — the same ingest-and-verify strategy as
models/hf_decoder.py (causal LMs) and models/ssl_encoders.py (wav2vec2/
HuBERT/Whisper).  Supported model types: bert, roberta/xlm-roberta (the
postencoder's shipped recipes); other AutoModel families raise a clear
error rather than silently mis-mapping.

Reference quirks kept:
- postencoder: mask is the *extended* additive mask, embeddings are NOT
  applied (the reference feeds ``hidden_states`` straight to
  ``model.encoder``, hugging_face_transformers_postencoder.py:160-168);
- lang_token_id != -1 prepends one token (embedding for the postencoder,
  id for the encoder) and bumps lengths by 1;
- length adaptor = n stride-2 Conv1d+ReLU, lengths floor-divided
  (:129-144), raising on utterances shorter than the total ratio.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


@dataclasses.dataclass(frozen=True)
class BertBodyConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-12
    vocab_size: int = 30522
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    pad_token_id: int = 0
    model_type: str = "bert"  # bert | roberta | xlm-roberta
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1

    @classmethod
    def from_hf_config(cls, hf) -> "BertBodyConfig":
        if hf.model_type not in ("bert", "roberta", "xlm-roberta"):
            raise ValueError(
                f"hugging_face encoder/postencoder supports bert/roberta "
                f"families; got model_type={hf.model_type!r}"
            )
        return cls(
            hidden_size=hf.hidden_size,
            num_hidden_layers=hf.num_hidden_layers,
            num_attention_heads=hf.num_attention_heads,
            intermediate_size=hf.intermediate_size,
            layer_norm_eps=hf.layer_norm_eps,
            vocab_size=hf.vocab_size,
            max_position_embeddings=hf.max_position_embeddings,
            type_vocab_size=getattr(hf, "type_vocab_size", 2),
            pad_token_id=getattr(hf, "pad_token_id", 0) or 0,
            model_type=hf.model_type,
            hidden_dropout=getattr(hf, "hidden_dropout_prob", 0.1),
            attention_dropout=getattr(hf, "attention_probs_dropout_prob", 0.1),
        )


class BertLayer(nn.Module):
    """One post-LN encoder layer (BertLayer: SelfAttention -> add&LN ->
    intermediate GELU -> output add&LN)."""

    cfg: BertBodyConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid, deterministic: bool = True):
        cfg = self.cfg
        h, nh = cfg.hidden_size, cfg.num_attention_heads
        dk = h // nh
        b, t, _ = x.shape

        def heads(y):
            return y.reshape(b, t, nh, dk)

        q = heads(nn.Dense(h, dtype=self.dtype, name="query")(x))
        k = heads(nn.Dense(h, dtype=self.dtype, name="key")(x))
        v = heads(nn.Dense(h, dtype=self.dtype, name="value")(x))
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(dk, jnp.float32)
        ).astype(self.dtype)
        scores = jnp.where(valid[:, None, None, :], scores, -1e30)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn = nn.Dropout(cfg.attention_dropout)(attn, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, h)
        ctx = nn.Dense(h, dtype=self.dtype, name="attn_out")(ctx)
        ctx = nn.Dropout(cfg.hidden_dropout)(ctx, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="attn_ln")(x + ctx)
        ff = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="ff1")(x)
        ff = jax.nn.gelu(ff, approximate=False)
        ff = nn.Dense(h, dtype=self.dtype, name="ff2")(ff)
        ff = nn.Dropout(cfg.hidden_dropout)(ff, deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="ff_ln")(x + ff)


class BertBody(nn.Module):
    """The layer stack only (HF ``model.encoder``) over hidden states."""

    cfg: BertBodyConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid, deterministic: bool = True):
        for i in range(self.cfg.num_hidden_layers):
            x = BertLayer(self.cfg, dtype=self.dtype, name=f"layers_{i}")(
                x, valid, deterministic
            )
        return x


class BertEmbeddings(nn.Module):
    """word + position + token-type embeddings + LN (BertEmbeddings).

    RoBERTa offsets position ids by pad_token_id + 1 (its
    create_position_ids_from_input_ids quirk).
    """

    cfg: BertBodyConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, deterministic: bool = True):
        cfg = self.cfg
        b, t = input_ids.shape
        x = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                     name="word")(input_ids)
        offset = cfg.pad_token_id + 1 if cfg.model_type != "bert" else 0
        pos = jnp.arange(t) + offset
        x = x + nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                         dtype=self.dtype, name="position")(pos)[None]
        x = x + nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                         dtype=self.dtype, name="token_type")(
            jnp.zeros((b, t), jnp.int32)
        )
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="ln")(x)
        return nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)


class HFTransformersEncoder(nn.Module):
    """Token-id encoder (hugging_face_transformers_encoder.py): optional
    lang-token prepend, embeddings + masked body, returns (hidden, lengths)."""

    cfg: BertBodyConfig
    lang_token_id: int = -1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, input_ids: jnp.ndarray, input_lengths: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.lang_token_id != -1:
            b = input_ids.shape[0]
            lang = jnp.full((b, 1), self.lang_token_id, input_ids.dtype)
            input_ids = jnp.concatenate([lang, input_ids], axis=1)
            input_lengths = input_lengths + 1
        x = BertEmbeddings(self.cfg, dtype=self.dtype, name="embeddings")(
            jnp.clip(input_ids, 0, self.cfg.vocab_size - 1), deterministic
        )
        valid = make_valid_mask(input_lengths, x.shape[1])
        x = BertBody(self.cfg, dtype=self.dtype, name="body")(
            x, valid, deterministic
        )
        return x, input_lengths


@dataclasses.dataclass(frozen=True)
class HFPostEncoderConfig:
    body: BertBodyConfig
    input_size: int = 256
    length_adaptor_n_layers: int = 0
    lang_token_id: int = -1
    model_name_or_path: str = ""


class HFTransformersPostEncoder(nn.Module):
    """Acoustic postencoder (hugging_face_transformers_postencoder.py):
    length-adaptor convs -> linear_in -> pretrained body over
    hidden_states."""

    cfg: HFPostEncoderConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, lengths: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        ratio = 2 ** cfg.length_adaptor_n_layers
        if x.shape[1] < ratio:
            raise ValueError(
                f"input has {x.shape[1]} frames; length adaptor needs >= {ratio}"
            )
        d = x.shape[-1]
        for i in range(cfg.length_adaptor_n_layers):
            x = nn.Conv(d, (2,), strides=(2,), padding="VALID",
                        dtype=self.dtype, name=f"adaptor_{i}")(x)
            x = jax.nn.relu(x)
        lengths = jnp.maximum(lengths // ratio, 1)
        x = nn.Dense(cfg.body.hidden_size, dtype=self.dtype, name="linear_in")(x)
        if cfg.lang_token_id != -1:
            # prepend the pretrained lang-token embedding (detached in the
            # reference; stored here as an ingested constant-init param)
            lang = self.param(
                "lang_token_embed", nn.initializers.zeros,
                (cfg.body.hidden_size,),
            )
            b = x.shape[0]
            x = jnp.concatenate(
                [jnp.broadcast_to(lang, (b, 1, cfg.body.hidden_size)).astype(x.dtype), x],
                axis=1,
            )
            lengths = lengths + 1
        valid = make_valid_mask(lengths, x.shape[1])
        x = BertBody(cfg.body, dtype=self.dtype, name="body")(
            x, valid, deterministic
        )
        return x, lengths


def convert_hf_bert_weights(
    state_dict: Dict[str, Any], cfg: BertBodyConfig,
    include_embeddings: bool = True,
) -> Dict:
    """torch BertModel/RobertaModel state_dict -> flax params for
    BertBody (+ BertEmbeddings when include_embeddings).

    Linear weights transpose ([out,in] -> [in,out]); embedding tables copy.
    """
    import numpy as np

    sd = {}
    for k, v in state_dict.items():
        sd[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    def pick(*names):
        for n in names:
            if n in sd:
                return sd[n]
        raise KeyError(f"none of {names} in state_dict")

    prefix = ""
    for cand in ("bert.", "roberta.", ""):
        if any(k.startswith(cand + "encoder.layer.0.") for k in sd):
            prefix = cand
            break

    def lin(name):
        return {
            "kernel": pick(name + ".weight").T.copy(),
            "bias": pick(name + ".bias"),
        }

    def ln(name):
        return {"scale": pick(name + ".weight"), "bias": pick(name + ".bias")}

    body: Dict[str, Any] = {}
    for i in range(cfg.num_hidden_layers):
        p = f"{prefix}encoder.layer.{i}."
        body[f"layers_{i}"] = {
            "query": lin(p + "attention.self.query"),
            "key": lin(p + "attention.self.key"),
            "value": lin(p + "attention.self.value"),
            "attn_out": lin(p + "attention.output.dense"),
            "attn_ln": ln(p + "attention.output.LayerNorm"),
            "ff1": lin(p + "intermediate.dense"),
            "ff2": lin(p + "output.dense"),
            "ff_ln": ln(p + "output.LayerNorm"),
        }
    if not include_embeddings:
        return body
    e = f"{prefix}embeddings."
    emb = {
        "word": {"embedding": pick(e + "word_embeddings.weight")},
        "position": {"embedding": pick(e + "position_embeddings.weight")},
        "token_type": {"embedding": pick(e + "token_type_embeddings.weight")},
        "ln": ln(e + "LayerNorm"),
    }
    return {"embeddings": emb, "body": body}


def load_hf_encoder_params(model_name_or_path: str):
    """AutoModel -> (BertBodyConfig, full param tree for
    HFTransformersEncoder).  transformers IS in the image; no network is
    touched for local paths."""
    import torch
    from transformers import AutoConfig, AutoModel

    hf_cfg = AutoConfig.from_pretrained(model_name_or_path)
    cfg = BertBodyConfig.from_hf_config(hf_cfg)
    model = AutoModel.from_pretrained(model_name_or_path,
                                      torch_dtype=torch.float32)
    params = convert_hf_bert_weights(model.state_dict(), cfg)
    del model
    return cfg, params


def load_hf_postencoder_params(cfg: HFPostEncoderConfig):
    """AutoModel -> params subtree {body, lang_token_embed?} for
    HFTransformersPostEncoder (adaptor/linear_in stay freshly initialized,
    like the reference's torch.nn.Linear)."""
    import torch
    from transformers import AutoModel

    model = AutoModel.from_pretrained(cfg.model_name_or_path,
                                      torch_dtype=torch.float32)
    out: Dict[str, Any] = {
        "body": convert_hf_bert_weights(
            model.state_dict(), cfg.body, include_embeddings=False
        )
    }
    if cfg.lang_token_id != -1:
        with torch.no_grad():
            emb = model.get_input_embeddings()(
                torch.tensor(cfg.lang_token_id)
            ).numpy()
        out["lang_token_embed"] = emb
    del model
    return out
