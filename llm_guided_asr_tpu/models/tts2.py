"""Discrete-unit TTS (espnet2/tts2/ rebuild, minimal-but-real).

tts2 replaces the mel target with discrete speech units (codec codes or
HuBERT k-means): text encoder -> attention decoder over the unit vocabulary,
label-smoothed CE; synthesis = greedy/beam unit generation + codec
decode_codes (or a unit vocoder).  Reuses the MT-style encoder and the shared
TransformerDecoder, so the on-device beam search applies to unit generation.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.transformer import PositionalEncoding, TransformerEncoderLayer
from llm_guided_asr_tpu.models.transformer_decoder import (
    TransformerDecoder,
    TransformerDecoderConfig,
)
from llm_guided_asr_tpu.ops.losses import accuracy, add_sos_eos, label_smoothing_loss
from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


@dataclasses.dataclass(frozen=True)
class TTS2Config:
    vocab_size: int = 100  # text vocab
    unit_vocab_size: int = 256  # discrete speech units (+1 sos/eos appended)
    adim: int = 128
    heads: int = 2
    units: int = 256
    elayers: int = 2
    decoder: TransformerDecoderConfig = TransformerDecoderConfig()
    lsm_weight: float = 0.1

    @property
    def unit_sos(self) -> int:
        return self.unit_vocab_size

    # beam-search interface parity
    @property
    def sos_id(self) -> int:
        return self.unit_sos

    @property
    def eos_id(self) -> int:
        return self.unit_sos

    @property
    def blank_id(self) -> int:
        return 0


class TTS2Model(nn.Module):
    cfg: TTS2Config
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.embed = nn.Embed(cfg.vocab_size, cfg.adim, dtype=self.dtype, name="embed")
        self.pos = PositionalEncoding(0.1, dtype=self.dtype, name="pos")
        self.blocks = [
            TransformerEncoderLayer(cfg.heads, cfg.units, 0.1, dtype=self.dtype,
                                    name=f"block_{i}")
            for i in range(cfg.elayers)
        ]
        self.after_norm = nn.LayerNorm(dtype=self.dtype, name="after_norm")
        self.unit_decoder = TransformerDecoder(
            cfg.unit_vocab_size + 1, cfg.decoder, dtype=self.dtype, name="unit_decoder"
        )

    def encode(self, text, text_lengths, deterministic: bool = True):
        valid = make_valid_mask(text_lengths, text.shape[1])
        x = self.embed(jnp.where(valid, text, 0))
        x = self.pos(x, deterministic)
        for blk in self.blocks:
            x = blk(x, valid[:, None, :], deterministic)
        x = self.after_norm(x)
        return jnp.where(valid[..., None], x, 0.0), text_lengths

    def decoder_logits(self, enc, enc_lens, ys_in, ys_in_lengths,
                       deterministic: bool = True, only_last: bool = False):
        return self.unit_decoder(enc, enc_lens, ys_in, ys_in_lengths, deterministic,
                                 only_last=only_last)

    def __call__(
        self,
        text: jnp.ndarray,  # [B, L] text ids, padded -1
        text_lengths: jnp.ndarray,
        units: jnp.ndarray,  # [B, U] target unit ids, padded -1
        units_lengths: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        cfg = self.cfg
        valid = make_valid_mask(text_lengths, text.shape[1])
        enc, enc_lens = self.encode(jnp.where(valid, text, 0), text_lengths,
                                    deterministic)
        u_in, u_out = add_sos_eos(units, units_lengths, cfg.unit_sos, cfg.unit_sos, -1)
        logits = self.unit_decoder(enc, enc_lens, u_in, units_lengths + 1, deterministic)
        loss = label_smoothing_loss(logits, u_out, cfg.lsm_weight, -1)
        stats = {"loss": loss, "acc": accuracy(logits, u_out, -1)}
        return loss, stats, jnp.asarray(text.shape[0], jnp.float32)
