"""Transducer ASR: prediction networks, joint network, model, greedy search.

Rebuild of the reference transducer stack (espnet2/asr/espnet_model.py's
use_transducer_decoder path + espnet2/asr_transducer/): stateless and
LSTM prediction networks (asr_transducer/decoder/{stateless,rnn}_decoder.py),
the RWKV decoder lives in models/rwkv.py, joint network
(joint_network.py: tanh(W_enc h + W_dec g) -> vocab), RNN-T loss
(ops/rnnt.py), and an on-device greedy search (lax.while_loop over the
(t, u) lattice; the reference's is a host loop).
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
from llm_guided_asr_tpu.ops.frontend import (
    FrontendConfig,
    default_frontend,
    global_mvn,
    utterance_mvn,
)
from llm_guided_asr_tpu.ops.losses import ctc_loss
from llm_guided_asr_tpu.ops.rnnt import rnnt_loss
from llm_guided_asr_tpu.ops.specaug import SpecAugConfig, specaug
from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


@dataclasses.dataclass(frozen=True)
class TransducerDecoderConfig:
    decoder_type: str = "stateless"  # stateless | rnn | rwkv | mega
    embed_size: int = 256
    hidden_size: int = 256
    num_layers: int = 1
    dropout_rate: float = 0.0
    # rwkv-specific
    context_size: int = 256
    # mega-specific (asr_transducer/decoder/mega_decoder.py defaults scaled)
    mega_qk_size: int = 64
    mega_v_size: int = 0  # 0 -> 2 * hidden_size
    mega_num_heads: int = 4
    mega_rel_pos_bias: str = "simple"  # simple | rotary
    mega_max_positions: int = 2048  # positional-bias span (raises past it)
    mega_ffn_size: int = 0  # 0 -> 2 * hidden_size (reference linear_size)
    # None -> dropout_rate (reference att_dropout_rate / ema_dropout_rate)
    mega_att_dropout_rate: Optional[float] = None
    mega_ema_dropout_rate: Optional[float] = None

    @classmethod
    def from_dict(cls, d: dict) -> "TransducerDecoderConfig":
        from llm_guided_asr_tpu.utils.config import filter_known_fields

        return cls(**filter_known_fields(cls, d, "decoder_conf"))


class StatelessDecoder(nn.Module):
    """asr_transducer/decoder/stateless_decoder.py: embedding only."""

    vocab_size: int
    cfg: TransducerDecoderConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, labels: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """[B, U] -> [B, U+1, H]: position 0 is the <blank>-context start."""
        b = labels.shape[0]
        y = jnp.concatenate([jnp.zeros((b, 1), labels.dtype), labels], axis=1)
        x = nn.Embed(self.vocab_size, self.cfg.embed_size, dtype=self.dtype, name="embed")(
            jnp.clip(y, 0, self.vocab_size - 1)
        )
        x = nn.Dropout(self.cfg.dropout_rate)(x, deterministic=deterministic)
        if self.cfg.embed_size != self.cfg.hidden_size:
            x = nn.Dense(self.cfg.hidden_size, dtype=self.dtype, name="proj")(x)
        return x


class RNNDecoder(nn.Module):
    """asr_transducer/decoder/rnn_decoder.py: embed + stacked LSTM."""

    vocab_size: int
    cfg: TransducerDecoderConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, labels: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b = labels.shape[0]
        y = jnp.concatenate([jnp.zeros((b, 1), labels.dtype), labels], axis=1)
        x = nn.Embed(self.vocab_size, self.cfg.embed_size, dtype=self.dtype, name="embed")(
            jnp.clip(y, 0, self.vocab_size - 1)
        )
        x = nn.Dropout(self.cfg.dropout_rate)(x, deterministic=deterministic)
        for i in range(self.cfg.num_layers):
            x = nn.RNN(nn.OptimizedLSTMCell(self.cfg.hidden_size), name=f"lstm_{i}")(x)
        return x


class JointNetwork(nn.Module):
    """asr_transducer/joint_network.py: tanh(W_enc h_t + W_dec g_u) -> vocab."""

    vocab_size: int
    joint_size: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, enc: jnp.ndarray, dec: jnp.ndarray) -> jnp.ndarray:
        """enc [..., De], dec [..., Dd] broadcastable -> [..., V]."""
        h = nn.Dense(self.joint_size, dtype=self.dtype, name="lin_enc")(enc) + nn.Dense(
            self.joint_size, dtype=self.dtype, name="lin_dec"
        )(dec)
        return nn.Dense(self.vocab_size, dtype=self.dtype, name="lin_out")(jnp.tanh(h))


@dataclasses.dataclass(frozen=True)
class TransducerModelConfig:
    vocab_size: int
    frontend: Optional[FrontendConfig] = FrontendConfig()
    specaug: Optional[SpecAugConfig] = None
    normalize: str = "global_mvn"
    encoder_type: str = "conformer"
    encoder: ConformerConfig = ConformerConfig()
    decoder: TransducerDecoderConfig = TransducerDecoderConfig()
    joint_size: int = 256
    aux_ctc_weight: float = 0.0  # auxiliary CTC on the encoder
    blank_id: int = 0
    ignore_id: int = -1
    # multi-blank transducer (Xu et al. 2023; reference espnet_model.py:64
    # transducer_multi_blank_durations + rnnt_multi_blank loss): extra
    # "big blank" output symbols that account for several encoder frames.
    # ids/durations align index-wise; sigma = logit under-normalization.
    multi_blank_durations: Tuple[int, ...] = ()
    multi_blank_ids: Tuple[int, ...] = ()
    multi_blank_sigma: float = 0.05

    @property
    def sos_id(self) -> int:  # interface parity with ASRModelConfig
        return self.vocab_size - 1

    @property
    def eos_id(self) -> int:
        return self.vocab_size - 1


class TransducerModel(nn.Module):
    cfg: TransducerModelConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        from llm_guided_asr_tpu.models.conformer import make_encoder

        self.encoder = make_encoder(cfg.encoder_type, cfg.encoder, self.dtype, name="encoder")
        dec_type = cfg.decoder.decoder_type
        if dec_type == "stateless":
            self.decoder = StatelessDecoder(cfg.vocab_size, cfg.decoder, dtype=self.dtype, name="decoder")
        elif dec_type == "rnn":
            self.decoder = RNNDecoder(cfg.vocab_size, cfg.decoder, dtype=self.dtype, name="decoder")
        elif dec_type == "rwkv":
            from llm_guided_asr_tpu.models.rwkv import RWKVDecoder

            self.decoder = RWKVDecoder(cfg.vocab_size, cfg.decoder, dtype=self.dtype, name="decoder")
        elif dec_type == "mega":
            from llm_guided_asr_tpu.models.mega_decoder import MEGADecoder

            self.decoder = MEGADecoder(cfg.vocab_size, cfg.decoder, dtype=self.dtype, name="decoder")
        else:
            raise ValueError(dec_type)
        self.joint = JointNetwork(cfg.vocab_size, cfg.joint_size, dtype=self.dtype, name="joint")
        if cfg.aux_ctc_weight > 0:
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
        return self.encoder(feats.astype(self.dtype), feats_lengths, deterministic)

    def joint_full(self, enc, dec):
        """[B,T,De] x [B,U+1,Dd] -> [B,T,U+1,V] (lattice logits)."""
        return self.joint(enc[:, :, None, :], dec[:, None, :, :])

    def joint_step(self, enc_vec, dec_vec):
        """[B,De] x [B,Dd] -> [B,V] single lattice cell (decode-time)."""
        return self.joint(enc_vec, dec_vec)

    def decode_labels(self, labels, deterministic: bool = True):
        return self.decoder(labels, deterministic)

    def __call__(
        self, speech, speech_lengths, text, text_lengths, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        cfg = self.cfg
        enc, enc_lens = self.encode(speech, speech_lengths, deterministic)
        valid = make_valid_mask(text_lengths, text.shape[1])
        labels = jnp.where(valid, text, 0)
        dec = self.decoder(labels, deterministic)  # [B, U+1, H]
        logits = self.joint_full(enc, dec)
        if cfg.multi_blank_durations:
            from llm_guided_asr_tpu.ops.rnnt import rnnt_loss_multi_blank

            ids = cfg.multi_blank_ids or tuple(
                cfg.vocab_size - 1 - i for i in range(len(cfg.multi_blank_durations))
            )
            loss_rnnt = rnnt_loss_multi_blank(
                logits, labels, enc_lens, text_lengths, cfg.blank_id,
                big_blank_ids=ids,
                big_blank_durations=tuple(cfg.multi_blank_durations),
                sigma=cfg.multi_blank_sigma,
            )
        else:
            loss_rnnt = rnnt_loss(logits, labels, enc_lens, text_lengths, cfg.blank_id)
        stats = {"loss_rnnt": loss_rnnt}
        loss = loss_rnnt
        if cfg.aux_ctc_weight > 0:
            loss_ctc = ctc_loss(self.ctc_head(enc), enc_lens, text, text_lengths, cfg.blank_id)
            stats["loss_ctc"] = loss_ctc
            loss = loss + cfg.aux_ctc_weight * loss_ctc
        stats["loss"] = loss
        return loss, stats, jnp.asarray(speech.shape[0], jnp.float32)


def transducer_greedy_decode(
    model: TransducerModel,
    variables: Dict,
    enc: jnp.ndarray,  # [B, T, D]
    enc_lens: jnp.ndarray,  # [B]
    max_symbols_per_step: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batch greedy transducer decode, fully on device.

    Walks the lattice with a while_loop: at (t, u) emit argmax; blank (or the
    per-frame symbol cap) advances t, otherwise u.  Prediction-network states
    are recomputed from the full label prefix each emission via the training
    forward (correct for all decoder types; cached stepping is a later
    optimization).  Returns (tokens [B, Umax], n_tokens [B]).
    """
    b, t_max, _ = enc.shape
    u_max = t_max * 1  # at most one emission per frame on average cap
    blank = model.cfg.blank_id

    def cond(state):
        t, u, tokens, n, sym_count = state
        return jnp.any(t < enc_lens)

    def body(state):
        t, u, tokens, n, sym_count = state
        dec_out = model.apply(
            variables, tokens, method=model.decode_labels
        )  # [B, U+1, H] for full prefix; select state at n
        g = jnp.take_along_axis(dec_out, n[:, None, None], axis=1)[:, 0]  # [B, H]
        tc = jnp.clip(t, 0, t_max - 1)
        h = jnp.take_along_axis(enc, tc[:, None, None], axis=1)[:, 0]  # [B, D]
        logits = model.apply(variables, h, g, method=model.joint_step)  # [B, V]
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        active = t < enc_lens
        emit = active & (pred != blank) & (n < u_max - 1) & (sym_count < max_symbols_per_step)
        # append where emitting
        tokens = jnp.where(
            emit[:, None] & (jnp.arange(u_max)[None, :] == n[:, None]), pred[:, None], tokens
        )
        n = jnp.where(emit, n + 1, n)
        sym_count = jnp.where(emit, sym_count + 1, 0)
        t = jnp.where(active & ~emit, t + 1, t)
        return (t, u, tokens, n, sym_count)

    tokens0 = jnp.zeros((b, u_max), jnp.int32)
    state = (
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b,), jnp.int32),
        tokens0,
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b,), jnp.int32),
    )
    t, u, tokens, n, _ = jax.lax.while_loop(cond, body, state)
    return tokens, n
