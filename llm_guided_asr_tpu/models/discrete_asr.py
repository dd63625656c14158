"""Discrete-unit ASR: discrete SSL units in, text out, CTC/attention hybrid.

Rebuild of espnet2/asr/discrete_asr_espnet_model.py (ESPnetDiscreteASRModel):
an MT-style token encoder over k-means/codec unit sequences (the "speech" is
a discrete token stream, espnet2/mt/espnet_model.py machinery) plus the ASR
CTC branch on the encoder output — loss = ctc_weight*ctc +
(1-ctc_weight)*label-smoothed attention CE, like the hybrid ASR model.
``patch_size`` stacks adjacent units into one frame (discrete_asr_espnet_
model.py patch_size arg) to shorten the sequence.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.transformer import (
    PositionalEncoding,
    TransformerEncoderLayer,
)
from llm_guided_asr_tpu.models.transformer_decoder import (
    TransformerDecoder,
    TransformerDecoderConfig,
)
from llm_guided_asr_tpu.ops.losses import (
    accuracy,
    add_sos_eos,
    ctc_loss,
    label_smoothing_loss,
)
from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


@dataclasses.dataclass(frozen=True)
class DiscreteASRConfig:
    vocab_size: int  # target text vocab
    src_vocab_size: int  # unit vocab (k-means clusters / codec codes)
    adim: int = 256
    heads: int = 4
    units: int = 1024
    elayers: int = 6
    patch_size: int = 1  # stack this many units per encoder frame
    decoder: TransformerDecoderConfig = TransformerDecoderConfig()
    ctc_weight: float = 0.3
    lsm_weight: float = 0.1
    length_normalized_loss: bool = False
    ignore_id: int = -1

    @property
    def sos_id(self) -> int:
        return self.vocab_size - 1

    @property
    def eos_id(self) -> int:
        return self.vocab_size - 1

    @property
    def blank_id(self) -> int:
        return 0


class DiscreteASRModel(nn.Module):
    cfg: DiscreteASRConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.src_embed = nn.Embed(cfg.src_vocab_size, cfg.adim, dtype=self.dtype,
                                  name="src_embed")
        if cfg.patch_size > 1:
            self.patch_proj = nn.Dense(cfg.adim, dtype=self.dtype, name="patch_proj")
        self.pos = PositionalEncoding(0.1, dtype=self.dtype, name="pos")
        self.blocks = [
            TransformerEncoderLayer(cfg.heads, cfg.units, 0.1, dtype=self.dtype,
                                    name=f"block_{i}")
            for i in range(cfg.elayers)
        ]
        self.after_norm = nn.LayerNorm(dtype=self.dtype, name="after_norm")
        self.decoder = TransformerDecoder(cfg.vocab_size, cfg.decoder,
                                          dtype=self.dtype, name="decoder")
        self.ctc_head = nn.Dense(cfg.vocab_size, dtype=self.dtype, name="ctc_head")

    # beam-search interface parity with ASRModel -----------------------
    def encode(self, speech, speech_lengths, deterministic: bool = True):
        """speech = discrete unit ids [B, Lu] (padded -1 or 0)."""
        cfg = self.cfg
        valid = make_valid_mask(speech_lengths, speech.shape[1])
        x = self.src_embed(jnp.where(valid, speech, 0))
        lens = speech_lengths
        if cfg.patch_size > 1:
            p = cfg.patch_size
            b, t, d = x.shape
            pad = (-t) % p
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            x = self.patch_proj(x.reshape(b, (t + pad) // p, p * d))
            lens = (speech_lengths + p - 1) // p
            valid = make_valid_mask(lens, x.shape[1])
        x = self.pos(x, deterministic)
        for blk in self.blocks:
            x = blk(x, valid[:, None, :], deterministic)
        x = self.after_norm(x)
        return jnp.where(valid[..., None], x, 0.0), lens

    def decoder_logits(self, enc, enc_lens, ys_in, ys_in_lengths,
                       deterministic: bool = True, only_last: bool = False):
        return self.decoder(enc, enc_lens, ys_in, ys_in_lengths, deterministic,
                            only_last=only_last)

    def ctc_logits(self, encoder_out: jnp.ndarray) -> jnp.ndarray:
        return self.ctc_head(encoder_out)

    def ctc_log_softmax(self, encoder_out: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.log_softmax(
            self.ctc_head(encoder_out).astype(jnp.float32), axis=-1
        )

    def __call__(
        self,
        speech: jnp.ndarray,  # [B, Lu] discrete unit ids
        speech_lengths: jnp.ndarray,
        text: jnp.ndarray,  # [B, L] target text ids, padded -1
        text_lengths: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        cfg = self.cfg
        enc, enc_lens = self.encode(speech, speech_lengths, deterministic)

        loss_ctc = jnp.asarray(0.0)
        if cfg.ctc_weight != 0.0:
            loss_ctc = ctc_loss(
                self.ctc_logits(enc), enc_lens, text, text_lengths,
                blank_id=cfg.blank_id,
            )
        loss_att = jnp.asarray(0.0)
        acc = jnp.asarray(0.0)
        if cfg.ctc_weight != 1.0:
            ys_in, ys_out = add_sos_eos(text, text_lengths, cfg.sos_id,
                                        cfg.eos_id, cfg.ignore_id)
            logits = self.decoder(enc, enc_lens, ys_in, text_lengths + 1,
                                  deterministic)
            loss_att = label_smoothing_loss(
                logits, ys_out, cfg.lsm_weight, cfg.ignore_id,
                cfg.length_normalized_loss,
            )
            acc = accuracy(logits, ys_out, cfg.ignore_id)
        loss = cfg.ctc_weight * loss_ctc + (1.0 - cfg.ctc_weight) * loss_att
        stats = {"loss": loss, "loss_ctc": loss_ctc, "loss_att": loss_att,
                 "acc": acc}
        return loss, stats, jnp.asarray(text.shape[0], jnp.float32)
