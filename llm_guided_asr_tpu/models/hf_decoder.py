"""Pretrained causal LM as the ASR attention decoder.

Rebuild of espnet2/asr/decoder/hugging_face_transformers_decoder.py
(causal_lm=True path): the encoder output is linear-projected into the LM's
embedding space and spliced into the input sequence as continuous
"audio token" embeddings —

    [prefix ids] [projected encoder frames] [postfix ids] [ys tokens]

(add_prefix_postfix, hugging_face_transformers_decoder.py:194-236); the
causal LM runs over the packed sequence and the loss/scores read the logits
at the ys positions.  The LM is our JAX Llama/Qwen (models/llm/llama.py)
with HF weight ingestion; mid-row padding of the variable-length encoder
span is handled by LlamaModel's cumsum positions + validity mask.

Implements the standard decoder interface (memory, memory_lengths, ys_in,
ys_in_lengths, only_last) so it plugs into ASRModel and the on-device beam
search unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.llm.llama import LlamaConfig, LlamaModel

Dtype = Any


@dataclasses.dataclass(frozen=True)
class HFCausalDecoderConfig:
    llm: LlamaConfig
    prefix_ids: Tuple[int, ...] = ()  # tokenized text prompt before audio
    postfix_ids: Tuple[int, ...] = ()  # tokenized text prompt after audio
    enc_frames_max: int = 512  # static audio-span width (pad/crop)


class HFCausalDecoder(nn.Module):
    cfg: HFCausalDecoderConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        self.llm = LlamaModel(self.cfg.llm, dtype=self.dtype, name="llm")
        self.linear_in = nn.Dense(self.cfg.llm.hidden_size, dtype=self.dtype,
                                  name="linear_in")

    def __call__(
        self,
        memory: jnp.ndarray,  # [B, T_enc, D]
        memory_lengths: jnp.ndarray,  # [B]
        ys_in: jnp.ndarray,  # [B, L]
        ys_in_lengths: jnp.ndarray,  # [B]
        deterministic: bool = True,
        only_last: bool = False,
    ) -> jnp.ndarray:
        cfg = self.cfg
        b, l = ys_in.shape
        p, q = len(cfg.prefix_ids), len(cfg.postfix_ids)
        t_enc = min(memory.shape[1], cfg.enc_frames_max)
        total = p + t_enc + q + l

        enc = self.linear_in(memory[:, :t_enc])  # [B, t_enc, H]
        enc_valid = jnp.arange(t_enc)[None, :] < jnp.minimum(memory_lengths, t_enc)[:, None]

        ids = jnp.zeros((b, total), jnp.int32)
        if p:
            ids = ids.at[:, :p].set(jnp.asarray(cfg.prefix_ids, jnp.int32)[None, :])
        if q:
            ids = ids.at[:, p + t_enc : p + t_enc + q].set(
                jnp.asarray(cfg.postfix_ids, jnp.int32)[None, :]
            )
        ids = ids.at[:, p + t_enc + q :].set(jnp.maximum(ys_in, 0))

        pos_t = jnp.arange(total)[None, :]
        in_enc = (pos_t >= p) & (pos_t < p + t_enc)
        in_ys = pos_t >= p + t_enc + q
        ys_valid = (pos_t - (p + t_enc + q)) < ys_in_lengths[:, None]
        valid = (
            (pos_t < p)
            | (in_enc & jnp.pad(enc_valid, ((0, 0), (p, total - p - t_enc))))
            | ((pos_t >= p + t_enc) & (pos_t < p + t_enc + q))
            | (in_ys & ys_valid)
        )

        override = jnp.zeros((b, total, cfg.llm.hidden_size), enc.dtype)
        override = override.at[:, p : p + t_enc].set(
            jnp.where(enc_valid[..., None], enc, 0.0)
        )

        _, logits, _ = self.llm(
            ids, valid, return_logits=True,
            embed_override=override, override_mask=in_enc & valid,
        )
        ys_logits = logits[:, p + t_enc + q :]  # [B, L, V]
        if only_last:
            return ys_logits[jnp.arange(b), ys_in_lengths - 1]
        return ys_logits
