"""LLM-guided speech translation model (the fork's second headline model).

Rebuild of espnet2/st/llm_guided_st_model.py:41 (LLMGuidedSTModel): same
guided-decoder machinery as the ASR variant (first-pass CTC on the *source*
transcript -> prompt -> frozen LLM -> guided decoder over the LLM vocab,
emitting the *target* translation), plus auxiliary ASR losses on the source
text:

  loss = (1 - asr_weight) * st_att
       + asr_weight * (mtlalpha * asr_ctc + (1 - mtlalpha) * asr_att)

(llm_guided_st_model.py:264-290).  The auxiliary ASR attention decoder
(extra_asr_decoder) is a standard TransformerDecoder over the source vocab.
sos/eos for the ST decoder are the LLM response delimiters; the source side
uses <sos/eos> = src_vocab_size - 1 (src_sym_sos/eos).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.conformer import ConformerConfig, ConformerEncoder, TransformerEncoder
from llm_guided_asr_tpu.models.llm.llama import LlamaConfig, LlamaModel
from llm_guided_asr_tpu.models.llm.prompt import PromptTemplate, gather_response, pack_prompt
from llm_guided_asr_tpu.models.transformer import DecoderLayer
from llm_guided_asr_tpu.models.transformer_decoder import (
    TransformerDecoder,
    TransformerDecoderConfig,
)
from llm_guided_asr_tpu.ops.frontend import FrontendConfig, default_frontend, global_mvn, utterance_mvn
from llm_guided_asr_tpu.ops.losses import accuracy, add_sos_eos, ctc_loss, label_smoothing_loss
from llm_guided_asr_tpu.ops.specaug import SpecAugConfig, specaug
from llm_guided_asr_tpu.search.greedy import ctc_greedy_decode
from llm_guided_asr_tpu.utils.masks import causal_attn_mask, make_valid_mask

Dtype = Any


@dataclasses.dataclass(frozen=True)
class LLMGuidedSTConfig:
    vocab_size: int  # target vocab = LLM vocab
    src_vocab_size: int
    llm: LlamaConfig
    prompt: PromptTemplate
    frontend: Optional[FrontendConfig] = FrontendConfig()
    specaug: Optional[SpecAugConfig] = None
    normalize: str = "global_mvn"
    encoder_type: str = "conformer"
    encoder: ConformerConfig = ConformerConfig()
    decoder: TransformerDecoderConfig = TransformerDecoderConfig()
    extra_asr_decoder: Optional[TransformerDecoderConfig] = None
    asr_weight: float = 0.3
    mtlalpha: float = 0.5  # weight of asr_ctc inside the asr loss
    lsm_weight: float = 0.0
    length_normalized_loss: bool = False
    ignore_id: int = -1
    blank_id: int = 0

    @property
    def sos_id(self) -> int:
        return self.prompt.start_of_response_id

    @property
    def eos_id(self) -> int:
        return self.prompt.end_of_response_id

    @property
    def src_sos_id(self) -> int:
        return self.src_vocab_size - 1

    @property
    def src_eos_id(self) -> int:
        return self.src_vocab_size - 1


class LLMGuidedSTModel(nn.Module):
    cfg: LLMGuidedSTConfig
    dtype: Dtype = jnp.float32
    llm_dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        from llm_guided_asr_tpu.models.conformer import make_encoder

        self.encoder = make_encoder(cfg.encoder_type, cfg.encoder, self.dtype, name="encoder")
        self.ctc_head = nn.Dense(cfg.src_vocab_size, dtype=self.dtype, name="ctc_head")
        self.llm = LlamaModel(cfg.llm, dtype=self.llm_dtype, name="llm")
        self.embed = nn.Dense(cfg.encoder.output_size, dtype=self.dtype, name="embed")
        dec = cfg.decoder
        self.decoders = [
            DecoderLayer(
                dec.attention_heads, dec.linear_units, dec.dropout_rate,
                dec.self_attention_dropout_rate, dec.src_attention_dropout_rate,
                dtype=self.dtype, name=f"block_{i}",
            )
            for i in range(dec.num_blocks)
        ]
        self.after_norm = nn.LayerNorm(dtype=self.dtype, name="after_norm")
        self.output_layer = nn.Dense(cfg.vocab_size, dtype=self.dtype, name="output_layer")
        if cfg.extra_asr_decoder is not None:
            self.asr_decoder = TransformerDecoder(
                cfg.src_vocab_size, cfg.extra_asr_decoder, dtype=self.dtype,
                name="extra_asr_decoder",
            )
        n_feat = cfg.frontend.n_mels if cfg.frontend is not None else 1
        if cfg.normalize == "global_mvn":
            self.mvn_mean = self.variable("mvn", "mean", lambda: jnp.zeros((n_feat,), jnp.float32))
            self.mvn_inv_std = self.variable("mvn", "inv_std", lambda: jnp.ones((n_feat,), jnp.float32))

    def _extract_feats(self, speech, speech_lengths):
        cfg = self.cfg
        if cfg.frontend is not None and speech.ndim == 2:
            f = cfg.frontend
            return default_frontend(
                speech, speech_lengths, fs=f.fs, n_fft=f.n_fft, win_length=f.win_length,
                hop_length=f.hop_length, n_mels=f.n_mels, fmin=f.fmin, fmax=f.fmax,
                htk=f.htk, center=f.center, window=f.window,
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
        return self.encoder(feats.astype(self.dtype), feats_lengths, deterministic=True)

    def ctc_logits(self, encoder_out):
        return self.ctc_head(encoder_out)

    def ctc_log_softmax(self, encoder_out):
        return jax.nn.log_softmax(self.ctc_head(encoder_out).astype(jnp.float32), axis=-1)

    def decoder_logits(
        self, encoder_out, encoder_out_lengths, ys_in, ys_in_lengths,
        deterministic: bool = True,
    ):
        """ST guided decoder: source-CTC hyp in the prompt, target response."""
        cfg = self.cfg
        ctc_lp = self.ctc_log_softmax(encoder_out)
        hyp, hyp_lengths = ctc_greedy_decode(
            ctc_lp, encoder_out_lengths, blank_id=cfg.blank_id, pad_id=cfg.prompt.pad_id
        )
        ids, valid, resp_start = pack_prompt(cfg.prompt, hyp, hyp_lengths, ys_in, ys_in_lengths)
        hidden, _ = self.llm(ids, valid)
        hidden = jax.lax.stop_gradient(hidden)
        tgt = gather_response(hidden, resp_start, ys_in.shape[1])
        resp_valid = make_valid_mask(ys_in_lengths, ys_in.shape[1])
        tgt = jnp.where(resp_valid[..., None], tgt.astype(self.dtype), 0.0)
        x = self.embed(tgt)
        tgt_mask = causal_attn_mask(ys_in_lengths, ys_in.shape[1])
        memory_mask = make_valid_mask(encoder_out_lengths, encoder_out.shape[1])[:, None, :]
        for layer in self.decoders:
            x = layer(x, tgt_mask, encoder_out, memory_mask, deterministic)
        return self.output_layer(self.after_norm(x))

    def __call__(
        self,
        speech,
        speech_lengths,
        text,  # [B, L] target (LLM vocab), padded -1
        text_lengths,
        src_text=None,  # [B, Ls] source transcript (src vocab), padded -1
        src_text_lengths=None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        cfg = self.cfg
        enc, enc_lens = self.encode(speech, speech_lengths, deterministic)
        stats: Dict[str, jnp.ndarray] = {}

        # ST attention loss (primary)
        ys_in, ys_out = add_sos_eos(text, text_lengths, cfg.sos_id, cfg.eos_id, cfg.ignore_id)
        st_logits = self.decoder_logits(enc, enc_lens, ys_in, text_lengths + 1, deterministic)
        loss_st = label_smoothing_loss(
            st_logits, ys_out, cfg.lsm_weight, cfg.ignore_id, cfg.length_normalized_loss
        )
        stats["loss_st_att"] = loss_st
        stats["acc"] = accuracy(st_logits, ys_out, cfg.ignore_id)

        loss = loss_st
        if cfg.asr_weight > 0.0 and src_text is not None:
            loss_asr_ctc = jnp.asarray(0.0, jnp.float32)
            loss_asr_att = jnp.asarray(0.0, jnp.float32)
            if cfg.mtlalpha > 0.0:
                loss_asr_ctc = ctc_loss(
                    self.ctc_logits(enc), enc_lens, src_text, src_text_lengths, cfg.blank_id
                )
                stats["loss_asr_ctc"] = loss_asr_ctc
            if cfg.mtlalpha < 1.0 and cfg.extra_asr_decoder is not None:
                s_in, s_out = add_sos_eos(
                    src_text, src_text_lengths, cfg.src_sos_id, cfg.src_eos_id, cfg.ignore_id
                )
                asr_logits = self.asr_decoder(enc, enc_lens, s_in, src_text_lengths + 1, deterministic)
                loss_asr_att = label_smoothing_loss(
                    asr_logits, s_out, cfg.lsm_weight, cfg.ignore_id, cfg.length_normalized_loss
                )
                stats["loss_asr_att"] = loss_asr_att
            if cfg.mtlalpha == 1.0:
                loss_asr = loss_asr_ctc
            elif cfg.mtlalpha == 0.0:
                loss_asr = loss_asr_att
            else:
                loss_asr = cfg.mtlalpha * loss_asr_ctc + (1 - cfg.mtlalpha) * loss_asr_att
            stats["loss_asr"] = loss_asr
            loss = (1 - cfg.asr_weight) * loss_st + cfg.asr_weight * loss_asr
        stats["loss"] = loss
        return loss, stats, jnp.asarray(speech.shape[0], jnp.float32)
