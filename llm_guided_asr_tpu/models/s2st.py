"""Speech-to-speech translation, discrete-unit variant (espnet2/s2st/ rebuild).

The modern S2ST recipe (unit-based, s2st/espnet_model.py unit_y path):
shared speech encoder; (a) an auxiliary target-text attention decoder;
(b) a unit decoder predicting discrete target-speech units (HuBERT k-means
or codec codes — see models/hubert.kmeans_units / models/codec.encode),
which a unit-vocoder turns back into audio.  Loss = unit CE +
asr/st auxiliary attention CE.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.asr_model import ASRModelConfig
from llm_guided_asr_tpu.models.transformer_decoder import (
    TransformerDecoder,
    TransformerDecoderConfig,
)
from llm_guided_asr_tpu.ops.frontend import default_frontend, utterance_mvn
from llm_guided_asr_tpu.ops.losses import accuracy, add_sos_eos, label_smoothing_loss

Dtype = Any


@dataclasses.dataclass(frozen=True)
class S2STConfig:
    base: ASRModelConfig = None  # encoder + (text) decoder config; vocab = text vocab
    unit_vocab_size: int = 200  # +1 reserved sos/eos appended internally
    st_weight: float = 0.3  # auxiliary target-text decoder weight


class S2STModel(nn.Module):
    cfg: S2STConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        base = self.cfg.base
        from llm_guided_asr_tpu.models.conformer import make_encoder

        self.encoder = make_encoder(base.encoder_type, base.encoder, self.dtype,
                                    name="encoder")
        self.text_decoder = TransformerDecoder(
            base.vocab_size, base.decoder, dtype=self.dtype, name="text_decoder"
        )
        self.unit_decoder = TransformerDecoder(
            self.cfg.unit_vocab_size + 1, base.decoder, dtype=self.dtype,
            name="unit_decoder",
        )

    @property
    def unit_sos(self) -> int:
        return self.cfg.unit_vocab_size  # appended sos/eos for the unit stream

    # beam-search interface over the UNIT decoder (s2st_inference path)
    def decoder_logits(self, enc, enc_lens, ys_in, ys_in_lengths,
                       deterministic: bool = True, only_last: bool = False):
        return self.unit_decoder(enc, enc_lens, ys_in, ys_in_lengths,
                                 deterministic, only_last=only_last)

    def _feats(self, speech, speech_lengths):
        base = self.cfg.base
        f = base.frontend
        feats, flens = default_frontend(
            speech, speech_lengths, fs=f.fs, n_fft=f.n_fft, hop_length=f.hop_length,
            n_mels=f.n_mels,
        )
        return utterance_mvn(feats, flens).astype(self.dtype), flens

    def encode(self, speech, speech_lengths, deterministic: bool = True):
        feats, flens = self._feats(speech, speech_lengths)
        return self.encoder(feats, flens, deterministic)

    def __call__(
        self,
        speech, speech_lengths,
        tgt_units, tgt_units_lengths,  # [B, U] target speech units, padded -1
        text=None, text_lengths=None,  # optional target text (aux)
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        cfg = self.cfg
        enc, enc_lens = self.encode(speech, speech_lengths, deterministic)
        stats: Dict[str, jnp.ndarray] = {}

        u_in, u_out = add_sos_eos(
            tgt_units, tgt_units_lengths, self.unit_sos, self.unit_sos, -1
        )
        unit_logits = self.unit_decoder(enc, enc_lens, u_in, tgt_units_lengths + 1,
                                        deterministic)
        loss_unit = label_smoothing_loss(unit_logits, u_out, 0.1, -1)
        stats["loss_unit"] = loss_unit
        stats["acc_unit"] = accuracy(unit_logits, u_out, -1)

        loss = loss_unit
        if text is not None and cfg.st_weight > 0:
            base = cfg.base
            t_in, t_out = add_sos_eos(text, text_lengths, base.sos_id, base.eos_id, -1)
            t_logits = self.text_decoder(enc, enc_lens, t_in, text_lengths + 1,
                                         deterministic)
            loss_st = label_smoothing_loss(t_logits, t_out, base.lsm_weight, -1)
            stats["loss_st"] = loss_st
            loss = (1 - cfg.st_weight) * loss_unit + cfg.st_weight * loss_st
        stats["loss"] = loss
        return loss, stats, jnp.asarray(speech.shape[0], jnp.float32)
