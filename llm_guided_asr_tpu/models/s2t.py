"""S2T / OWSM-style multitask speech-to-text (espnet2/s2t/espnet_model.py rebuild).

The OWSM formulation: the decoder is prompted with the *previous* utterance's
text (text_prev) as context, then emits the current target text (which the
preprocessor has prefixed with <lang>/<task> special tokens, reference
s2t preprocessor); CTC trains on a cleaner transcript stream (text_ctc).
Decoder input = [sos | text_prev | text]; loss covers only the text span
(+eos) — the prompt is conditioned on but never predicted.

Long-form inference reuses Speech2Text.decode_long (s2t_inference.py:551).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.asr_model import ASRModelConfig
from llm_guided_asr_tpu.models.llm.prompt import pack_segments
from llm_guided_asr_tpu.models.transformer_decoder import TransformerDecoder
from llm_guided_asr_tpu.ops.frontend import default_frontend, global_mvn, utterance_mvn
from llm_guided_asr_tpu.ops.losses import accuracy, ctc_loss, label_smoothing_loss
from llm_guided_asr_tpu.ops.specaug import specaug
from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


class S2TModel(nn.Module):
    """forward(speech, lens, text, tlens, text_prev, plens, text_ctc, clens)."""

    cfg: ASRModelConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        from llm_guided_asr_tpu.models.conformer import make_encoder

        self.encoder = make_encoder(cfg.encoder_type, cfg.encoder, self.dtype, name="encoder")
        self.decoder = TransformerDecoder(cfg.vocab_size, cfg.decoder, dtype=self.dtype, name="decoder")
        self.ctc_head = nn.Dense(cfg.vocab_size, dtype=self.dtype, name="ctc_head")
        n_feat = cfg.frontend.n_mels if cfg.frontend is not None else 1
        if cfg.normalize == "global_mvn":
            self.mvn_mean = self.variable("mvn", "mean", lambda: jnp.zeros((n_feat,), jnp.float32))
            self.mvn_inv_std = self.variable("mvn", "inv_std", lambda: jnp.ones((n_feat,), jnp.float32))

    def _extract_feats(self, speech, speech_lengths):
        cfg = self.cfg
        if cfg.frontend is not None and speech.ndim == 2:
            f = cfg.frontend
            return default_frontend(
                speech, speech_lengths, fs=f.fs, n_fft=f.n_fft, hop_length=f.hop_length,
                n_mels=f.n_mels, fmin=f.fmin, fmax=f.fmax,
            )
        return speech, speech_lengths

    def collect_feats(self, speech, speech_lengths):
        feats, feats_lengths = self._extract_feats(speech, speech_lengths)
        return {"feats": feats, "feats_lengths": feats_lengths}

    def encode(self, speech, speech_lengths, deterministic: bool = True):
        cfg = self.cfg
        feats, feats_lengths = self._extract_feats(speech, speech_lengths)
        if cfg.specaug is not None and not deterministic:
            feats = specaug(self.make_rng("specaug"), feats, feats_lengths, cfg.specaug)
        if cfg.normalize == "global_mvn":
            feats = global_mvn(feats, self.mvn_mean.value, self.mvn_inv_std.value, feats_lengths)
        elif cfg.normalize == "utterance_mvn":
            feats = utterance_mvn(feats, feats_lengths)
        return self.encoder(feats.astype(self.dtype), feats_lengths, deterministic)

    def ctc_logits(self, encoder_out):
        return self.ctc_head(encoder_out)

    def ctc_log_softmax(self, encoder_out):
        return jax.nn.log_softmax(self.ctc_head(encoder_out).astype(jnp.float32), axis=-1)

    def decoder_logits(self, encoder_out, encoder_out_lengths, ys_in, ys_in_lengths,
                       deterministic: bool = True):
        return self.decoder(encoder_out, encoder_out_lengths, ys_in, ys_in_lengths, deterministic)

    def build_prompted_io(self, text, text_lengths, text_prev, text_prev_lengths):
        """[sos | prev | text] inputs and text(+eos)-only targets."""
        cfg = self.cfg
        tvalid = make_valid_mask(text_lengths, text.shape[1])
        clean = jnp.where(tvalid, text, 0)
        pvalid = make_valid_mask(text_prev_lengths, text_prev.shape[1])
        prev_clean = jnp.where(pvalid, text_prev, 0)
        ids, valid, starts = pack_segments(
            [(cfg.sos_id,), (), ()],
            [(prev_clean, text_prev_lengths), (clean, text_lengths)],
            pad_id=0,
        )
        total = ids.shape[1]
        text_start = starts[:, 1]
        text_end = text_start + text_lengths
        pos = jnp.arange(total)[None, :]
        shifted = jnp.concatenate([ids[:, 1:], jnp.zeros((ids.shape[0], 1), ids.dtype)], axis=1)
        ys_out = jnp.where(
            (pos >= text_start[:, None] - 1) & (pos < text_end[:, None] - 1),
            shifted,
            jnp.where(pos == text_end[:, None] - 1, cfg.eos_id, cfg.ignore_id),
        )
        in_lengths = 1 + text_prev_lengths + text_lengths
        return ids, ys_out, in_lengths

    def __call__(
        self,
        speech, speech_lengths,
        text, text_lengths,  # target text (incl. <lang>/<task> prefix tokens)
        text_prev=None, text_prev_lengths=None,  # conditioning context
        text_ctc=None, text_ctc_lengths=None,  # CTC stream
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        cfg = self.cfg
        b = speech.shape[0]
        if text_prev is None:
            text_prev = jnp.zeros((b, 0), text.dtype)
            text_prev_lengths = jnp.zeros((b,), text_lengths.dtype)
        enc, enc_lens = self.encode(speech, speech_lengths, deterministic)
        stats: Dict[str, jnp.ndarray] = {}

        loss_ctc = jnp.asarray(0.0, jnp.float32)
        if cfg.ctc_weight > 0.0:
            ctext = text_ctc if text_ctc is not None else text
            clens = text_ctc_lengths if text_ctc is not None else text_lengths
            loss_ctc = ctc_loss(self.ctc_logits(enc), enc_lens, ctext, clens, cfg.blank_id)
            stats["loss_ctc"] = loss_ctc

        ys_in, ys_out, in_lens = self.build_prompted_io(
            text, text_lengths, text_prev, text_prev_lengths
        )
        logits = self.decoder(enc, enc_lens, ys_in, in_lens, deterministic)
        loss_att = label_smoothing_loss(
            logits, ys_out, cfg.lsm_weight, cfg.ignore_id, cfg.length_normalized_loss
        )
        stats["loss_att"] = loss_att
        stats["acc"] = accuracy(logits, ys_out, cfg.ignore_id)
        loss = (
            cfg.ctc_weight * loss_ctc + (1 - cfg.ctc_weight) * loss_att
            if cfg.ctc_weight > 0
            else loss_att
        )
        stats["loss"] = loss
        return loss, stats, jnp.asarray(b, jnp.float32)
