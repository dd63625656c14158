"""Hybrid CTC/attention ASR model (flax.linen).

Rebuild of espnet2/asr/espnet_model.py:37 (ESPnetASRModel): frontend ->
specaug -> normalize -> encoder -> {CTC head, attention decoder};
loss = ctc_weight * ctc + (1 - ctc_weight) * label-smoothed attention CE.

Contract mirrors espnet2/train/abs_espnet_model.py: ``__call__`` returns
``(loss, stats, weight)`` where stats is a dict of f32 scalars and weight is
the batch size (for distributed weighted averaging).

Conventions inherited from the reference:
- blank_id = 0, sos = eos = vocab_size - 1 (espnet_model.py), ignore_id = -1;
- the frozen config travels with the checkpoint (config.yaml analog).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.conformer import (
    ConformerConfig,
    ConformerEncoder,
    TransformerEncoder,
)
from llm_guided_asr_tpu.models.transformer_decoder import (
    TransformerDecoder,
    TransformerDecoderConfig,
)
from llm_guided_asr_tpu.ops.frontend import FrontendConfig, default_frontend, global_mvn, utterance_mvn
from llm_guided_asr_tpu.ops.losses import (
    accuracy,
    add_sos_eos,
    ctc_loss,
    label_smoothing_loss,
)
from llm_guided_asr_tpu.ops.specaug import SpecAugConfig, specaug

Dtype = Any


@dataclasses.dataclass(frozen=True)
class ASRModelConfig:
    vocab_size: int
    frontend: Optional[FrontendConfig] = FrontendConfig()
    specaug: Optional[SpecAugConfig] = None
    normalize: str = "global_mvn"  # global_mvn | utterance_mvn | none
    encoder_type: str = "conformer"  # conformer | transformer
    encoder: ConformerConfig = ConformerConfig()
    decoder_type: str = "transformer"  # transformer | rnn | s4 | ... | hugging_face
    decoder: TransformerDecoderConfig = TransformerDecoderConfig()
    # decoder_type == "hugging_face": pretrained causal LM as decoder
    # (hugging_face_transformers_decoder.py causal_lm path)
    hf_decoder: Optional[Any] = None  # HFCausalDecoderConfig
    # SSL-features frontend (s3prl.py S3prlFrontend analog): a frozen
    # pretrained wav2vec2/HuBERT encoder turns raw waveform into features
    # consumed by the main encoder; (kind, W2VConfig)
    ssl_frontend: Optional[Any] = None
    # preencoder (espnet2/asr/preencoder/sinc.py): ("sinc", SincPreencoderConfig)
    # applied between normalize and encoder; pairs with the sliding_window
    # frontend (frontend.type)
    preencoder: Optional[Any] = None
    # postencoder (length_adaptor_postencoder.py): ("length_adaptor", cfg)
    # applied to the encoder output
    postencoder: Optional[Any] = None
    ctc_weight: float = 0.5
    # ctc_type (espnet2/asr/ctc.py): builtin/builtin2 -> the FB kernel
    # (zero_infinity included); brctc -> delay-penalized Bayes-risk variant
    ctc_type: str = "builtin"
    brctc_risk_factor: float = 0.0
    interctc_weight: float = 0.0
    lsm_weight: float = 0.0
    length_normalized_loss: bool = False
    ignore_id: int = -1
    blank_id: int = 0
    sos: Optional[int] = None  # default vocab_size - 1
    eos: Optional[int] = None

    @property
    def sos_id(self) -> int:
        return self.vocab_size - 1 if self.sos is None else self.sos

    @property
    def eos_id(self) -> int:
        return self.vocab_size - 1 if self.eos is None else self.eos


class ASRModel(nn.Module):
    cfg: ASRModelConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        from llm_guided_asr_tpu.models.conformer import make_encoder

        self.encoder = make_encoder(cfg.encoder_type, cfg.encoder, self.dtype, name="encoder")
        if cfg.ctc_weight < 1.0:
            if cfg.decoder_type == "s4":
                # espnet2/asr/decoder/s4_decoder.py (--decoder s4)
                from llm_guided_asr_tpu.models.s4_decoder import (
                    S4Decoder,
                    S4DecoderConfig,
                )

                self.decoder = S4Decoder(
                    S4DecoderConfig(
                        vocab_size=cfg.vocab_size,
                        d_model=cfg.encoder.output_size,
                        n_layers=max(cfg.decoder.num_blocks, 1),
                        attention_heads=cfg.decoder.attention_heads,
                        linear_units=cfg.decoder.linear_units,
                        dropout_rate=cfg.decoder.dropout_rate,
                    ),
                    dtype=self.dtype, name="decoder",
                )
            elif cfg.decoder_type == "rnn":
                # espnet2/asr/decoder/rnn_decoder.py (--decoder rnn)
                from llm_guided_asr_tpu.models.rnn_decoder import (
                    RNNDecoder,
                    RNNDecoderConfig,
                )

                self.decoder = RNNDecoder(
                    RNNDecoderConfig(
                        vocab_size=cfg.vocab_size,
                        hidden=cfg.decoder.linear_units,
                        layers=max(cfg.decoder.num_blocks, 1),
                        embed_dim=min(cfg.encoder.output_size, 256),
                        att_dim=cfg.encoder.output_size,
                    ),
                    dtype=self.dtype, name="decoder",
                )
            elif cfg.decoder_type == "hugging_face":
                from llm_guided_asr_tpu.models.hf_decoder import HFCausalDecoder

                self.decoder = HFCausalDecoder(cfg.hf_decoder, dtype=self.dtype,
                                               name="decoder")
            elif cfg.decoder_type in ("lightconv", "dynamicconv"):
                # espnet2 lightconv/dynamicconv decoder choices
                from llm_guided_asr_tpu.models.transformer_decoder import (
                    ConvTransformerDecoder,
                )

                self.decoder = ConvTransformerDecoder(
                    cfg.vocab_size, cfg.decoder,
                    dynamic=(cfg.decoder_type == "dynamicconv"),
                    dtype=self.dtype, name="decoder",
                )
            else:
                self.decoder = TransformerDecoder(
                    cfg.vocab_size, cfg.decoder, dtype=self.dtype, name="decoder"
                )
        if cfg.ctc_weight > 0.0:
            self.ctc_head = nn.Dense(cfg.vocab_size, dtype=self.dtype, name="ctc_head")
        if cfg.ssl_frontend is not None:
            from llm_guided_asr_tpu.models.ssl_encoders import (
                Wav2Vec2Encoder,
            )

            kind, ssl_cfg = cfg.ssl_frontend
            # raw Wav2Vec2/HuBERT trunk (no projection): features are the
            # SSL hidden states, like S3prlFrontend's upstream output
            self.ssl_frontend_mod = Wav2Vec2Encoder(ssl_cfg, dtype=self.dtype,
                                                    name="ssl_frontend")
        if cfg.frontend is not None and cfg.frontend.fused:
            from llm_guided_asr_tpu.ops.frontend import FusedFrontend

            self.fused_frontend = FusedFrontend(
                frontends=cfg.frontend.fused, proj_dim=cfg.frontend.proj_dim,
                fs=cfg.frontend.fs, name="fused_frontend",
            )
        if cfg.frontend is not None and (
            cfg.frontend.use_beamformer or cfg.frontend.use_wpe
        ):
            from llm_guided_asr_tpu.ops.frontend import MultichannelFrontend

            f = cfg.frontend
            self.mc_frontend = MultichannelFrontend(
                n_fft=f.n_fft, win_length=f.win_length, hop_length=f.hop_length,
                n_mels=f.n_mels, fs=f.fs, fmin=f.fmin, fmax=f.fmax, htk=f.htk,
                center=f.center, window=f.window, use_wpe=f.use_wpe,
                wpe_taps=f.wpe_taps, wpe_delay=f.wpe_delay,
                wpe_iterations=f.wpe_iterations, use_beamformer=f.use_beamformer,
                mask_units=f.mask_units, ref_channel=f.ref_channel,
                name="mc_frontend",
            )
        if cfg.ssl_frontend is not None:
            n_feat = cfg.ssl_frontend[1].hidden_size
        else:
            n_feat = cfg.frontend.output_dim if cfg.frontend is not None else None
        if cfg.preencoder is not None:
            from llm_guided_asr_tpu.models.preencoder import LightweightSincConvs

            kind, pre_cfg = cfg.preencoder
            if kind != "sinc":
                raise ValueError(f"unknown preencoder {kind!r}")
            self.preencoder_mod = LightweightSincConvs(
                pre_cfg, dtype=self.dtype, name="preencoder"
            )
        if cfg.postencoder is not None:
            kind, post_cfg = cfg.postencoder
            if kind == "length_adaptor":
                from llm_guided_asr_tpu.models.preencoder import (
                    LengthAdaptorPostEncoder,
                )

                self.postencoder_mod = LengthAdaptorPostEncoder(
                    post_cfg, dtype=self.dtype, name="postencoder"
                )
            elif kind == "hugging_face_transformers":
                # pretrained BERT-family body over the acoustic encoder
                # output (hugging_face_transformers_postencoder.py)
                from llm_guided_asr_tpu.models.hf_encoder import (
                    HFTransformersPostEncoder,
                )

                self.postencoder_mod = HFTransformersPostEncoder(
                    post_cfg, dtype=self.dtype, name="postencoder"
                )
            else:
                raise ValueError(f"unknown postencoder {kind!r}")
        if cfg.normalize == "global_mvn":
            # populated from collect-stats feats_stats.npz (global_mvn.py:26)
            dim = n_feat if n_feat is not None else 1
            self.mvn_mean = self.variable(
                "mvn", "mean", lambda: jnp.zeros((dim,), jnp.float32)
            )
            self.mvn_inv_std = self.variable(
                "mvn", "inv_std", lambda: jnp.ones((dim,), jnp.float32)
            )

    # ------------------------------------------------------------------
    # feature path
    # ------------------------------------------------------------------
    def _extract_feats(
        self, speech: jnp.ndarray, speech_lengths: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        if cfg.ssl_frontend is not None and speech.ndim == 2:
            # frozen-SSL features (S3prlFrontend path); stop_gradient mirrors
            # the reference's frozen upstream default (s3prl.py)
            feats, flens = self.ssl_frontend_mod(speech, speech_lengths)
            return jax.lax.stop_gradient(feats), flens
        if cfg.frontend is not None and speech.ndim == 3:
            # multichannel [B, S, C]: WPE/MVDR path (or reference channel)
            if cfg.frontend.use_beamformer or cfg.frontend.use_wpe:
                return self.mc_frontend(speech, speech_lengths)
            speech = speech[..., cfg.frontend.ref_channel]
        if cfg.frontend is not None and cfg.frontend.fused and speech.ndim == 2:
            return self.fused_frontend(speech, speech_lengths)
        if (
            cfg.frontend is not None
            and cfg.frontend.type == "sliding_window"
            and speech.ndim == 2
        ):
            from llm_guided_asr_tpu.models.preencoder import sliding_window

            return sliding_window(
                speech, speech_lengths,
                win_length=cfg.frontend.win_length or 400,
                hop_length=cfg.frontend.hop_length,
            )
        if cfg.frontend is not None and speech.ndim == 2:
            f = cfg.frontend
            # bf16-compute models run the DFT matmul at default precision
            # (one MXU pass) instead of HIGHEST (6-pass f32 emulation,
            # ~1.3 ms/step at B=32): the features feed log + MVN and the
            # encoder consumes them in bf16 anyway.  f32 models (CPU parity
            # suites) keep the f32-exact default.
            prec = None if self.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
            return default_frontend(
                speech, speech_lengths,
                fs=f.fs, n_fft=f.n_fft, win_length=f.win_length,
                hop_length=f.hop_length, n_mels=f.n_mels, fmin=f.fmin,
                fmax=f.fmax, htk=f.htk, center=f.center, window=f.window,
                precision=prec,
            )
        return speech, speech_lengths

    def collect_feats(
        self, speech: jnp.ndarray, speech_lengths: jnp.ndarray
    ) -> Dict[str, jnp.ndarray]:
        feats, feats_lengths = self._extract_feats(speech, speech_lengths)
        return {"feats": feats, "feats_lengths": feats_lengths}

    def encode(
        self,
        speech: jnp.ndarray,
        speech_lengths: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Frontend + augmentation + normalization + encoder (espnet_model.py encode)."""
        cfg = self.cfg
        feats, feats_lengths = self._extract_feats(speech, speech_lengths)
        if cfg.specaug is not None and not deterministic:
            feats = specaug(self.make_rng("specaug"), feats, feats_lengths, cfg.specaug)
        if cfg.normalize == "global_mvn":
            feats = global_mvn(
                feats, self.mvn_mean.value, self.mvn_inv_std.value, feats_lengths
            )
        elif cfg.normalize == "utterance_mvn":
            feats = utterance_mvn(feats, feats_lengths)
        feats = feats.astype(self.dtype)
        if cfg.preencoder is not None:
            feats = self.preencoder_mod(feats, deterministic)
        out = self.encoder(feats, feats_lengths, deterministic)
        if len(out) == 3:  # interCTC taps configured
            out = (out[0], out[1])
        if cfg.postencoder is not None:
            out = self.postencoder_mod(out[0], out[1], deterministic)
        return out

    def encode_with_intermediates(self, speech, speech_lengths, deterministic=True):
        cfg = self.cfg
        feats, feats_lengths = self._extract_feats(speech, speech_lengths)
        if cfg.specaug is not None and not deterministic:
            feats = specaug(self.make_rng("specaug"), feats, feats_lengths, cfg.specaug)
        if cfg.normalize == "global_mvn":
            feats = global_mvn(feats, self.mvn_mean.value, self.mvn_inv_std.value, feats_lengths)
        elif cfg.normalize == "utterance_mvn":
            feats = utterance_mvn(feats, feats_lengths)
        feats = feats.astype(self.dtype)
        if cfg.preencoder is not None:
            feats = self.preencoder_mod(feats, deterministic)
        out = self.encoder(feats, feats_lengths, deterministic)
        taps = out[2] if len(out) == 3 else ()
        enc, enc_lens = out[0], out[1]
        if cfg.postencoder is not None:
            enc, enc_lens = self.postencoder_mod(enc, enc_lens, deterministic)
        return enc, enc_lens, taps

    def ctc_logits(self, encoder_out: jnp.ndarray) -> jnp.ndarray:
        return self.ctc_head(encoder_out)

    def ctc_log_softmax(self, encoder_out: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.log_softmax(self.ctc_head(encoder_out).astype(jnp.float32), axis=-1)

    def decoder_logits(
        self,
        encoder_out: jnp.ndarray,
        encoder_out_lengths: jnp.ndarray,
        ys_in: jnp.ndarray,
        ys_in_lengths: jnp.ndarray,
        deterministic: bool = True,
        only_last: bool = False,
    ) -> jnp.ndarray:
        return self.decoder(
            encoder_out, encoder_out_lengths, ys_in, ys_in_lengths, deterministic,
            only_last=only_last,
        )

    # ------------------------------------------------------------------
    # training forward
    # ------------------------------------------------------------------
    def __call__(
        self,
        speech: jnp.ndarray,
        speech_lengths: jnp.ndarray,
        text: jnp.ndarray,  # [B, L] padded with ignore_id (-1)
        text_lengths: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        cfg = self.cfg
        batch_size = speech.shape[0]
        enc_out, enc_lens, intermediates = self.encode_with_intermediates(
            speech, speech_lengths, deterministic
        )

        stats: Dict[str, jnp.ndarray] = {}
        loss_ctc = jnp.asarray(0.0, jnp.float32)
        if cfg.ctc_weight > 0.0:
            risk = (cfg.brctc_risk_factor if cfg.ctc_type == "brctc" else 0.0)
            loss_ctc = ctc_loss(
                self.ctc_logits(enc_out), enc_lens, text, text_lengths,
                cfg.blank_id, time_risk=risk,
            )
            stats["loss_ctc"] = loss_ctc
            if cfg.interctc_weight > 0.0 and intermediates:
                # espnet_model.py: loss_ctc = (1-w)*ctc + w*mean(inter ctc)
                inter = jnp.mean(
                    jnp.stack([
                        ctc_loss(self.ctc_logits(h), enc_lens, text, text_lengths,
                                 cfg.blank_id)
                        for h in intermediates
                    ])
                )
                stats["loss_interctc"] = inter
                loss_ctc = (1 - cfg.interctc_weight) * loss_ctc + cfg.interctc_weight * inter

        loss_att = jnp.asarray(0.0, jnp.float32)
        if cfg.ctc_weight < 1.0:
            ys_in, ys_out = add_sos_eos(
                text, text_lengths, cfg.sos_id, cfg.eos_id, cfg.ignore_id
            )
            dec_logits = self.decoder_logits(
                enc_out, enc_lens, ys_in, text_lengths + 1, deterministic
            )
            loss_att = label_smoothing_loss(
                dec_logits, ys_out, cfg.lsm_weight, cfg.ignore_id, cfg.length_normalized_loss
            )
            stats["loss_att"] = loss_att
            stats["acc"] = accuracy(dec_logits, ys_out, cfg.ignore_id)

        if cfg.ctc_weight == 0.0:
            loss = loss_att
        elif cfg.ctc_weight == 1.0:
            loss = loss_ctc
        else:
            loss = cfg.ctc_weight * loss_ctc + (1.0 - cfg.ctc_weight) * loss_att
        stats["loss"] = loss
        weight = jnp.asarray(batch_size, jnp.float32)
        return loss, stats, weight
