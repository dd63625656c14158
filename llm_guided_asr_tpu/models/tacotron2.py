"""Tacotron2: autoregressive attention-based TTS.

Rebuild of espnet2/tts/tacotron2/tacotron2.py (Shen et al. 2018): embedding
-> conv stack -> BiLSTM encoder; autoregressive decoder with location-
sensitive attention (prenet -> attention LSTM -> decoder LSTM -> mel + stop
token); 5-conv postnet residual.  Losses: L1+MSE on pre/post-net mels and
BCE on the stop token (espnet2/tts/tacotron2/loss.py), plus a guided
attention option.

TPU mapping: the per-frame decoder recurrence is one ``nn.scan`` over the
frame axis (teacher-forced in training, free-running in inference) — the
location-attention conv and all projections batch over B inside each step.
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
class Tacotron2Config:
    vocab_size: int = 100
    n_mels: int = 80
    embed_dim: int = 128
    econv_layers: int = 2
    econv_filters: int = 128
    elstm_units: int = 64  # per direction
    att_dim: int = 64
    att_filters: int = 8
    att_kernel: int = 15
    prenet_units: int = 64
    dlstm_units: int = 256
    postnet_layers: int = 3
    postnet_filters: int = 128
    reduction_factor: int = 1
    use_guided_attn: bool = True
    guided_attn_sigma: float = 0.4


class Taco2Encoder(nn.Module):
    cfg: Tacotron2Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, text, text_lengths, deterministic=True):
        cfg = self.cfg
        x = nn.Embed(cfg.vocab_size, cfg.embed_dim, dtype=self.dtype, name="embed")(
            jnp.clip(text, 0, cfg.vocab_size - 1)
        )
        valid = make_valid_mask(text_lengths, text.shape[1])
        for i in range(cfg.econv_layers):
            h = nn.Conv(cfg.econv_filters, (5,), padding="SAME", dtype=self.dtype,
                        name=f"conv_{i}")(x)
            h = nn.LayerNorm(dtype=self.dtype, name=f"ln_{i}")(h)
            x = jax.nn.relu(h)
            x = jnp.where(valid[..., None], x, 0.0)
        fwd = nn.RNN(nn.OptimizedLSTMCell(cfg.elstm_units), name="lstm_f")(x)
        bwd = nn.RNN(nn.OptimizedLSTMCell(cfg.elstm_units), reverse=True,
                     keep_order=True, name="lstm_b")(x)
        x = jnp.concatenate([fwd, bwd], axis=-1)
        return jnp.where(valid[..., None], x, 0.0)


class Taco2DecoderCell(nn.Module):
    """One decoder frame step with location-sensitive attention."""

    cfg: Tacotron2Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, prev_frame, enc, enc_proj, valid, deterministic=True):
        cfg = self.cfg
        (att_c, att_h), (dec_c, dec_h), att_w, att_cum = carry
        # prenet on the previous frame (always-on dropout is tacotron lore;
        # deterministic here for test stability)
        pre = prev_frame
        for i in range(2):
            pre = jax.nn.relu(
                nn.Dense(cfg.prenet_units, dtype=self.dtype, name=f"prenet_{i}")(pre)
            )
        # attention LSTM
        ctx_prev = jnp.einsum("bl,bld->bd", att_w, enc)  # prev attention context
        (att_c, att_h), _ = nn.OptimizedLSTMCell(cfg.dlstm_units, name="att_lstm")(
            (att_c, att_h), jnp.concatenate([pre, ctx_prev], -1)
        )
        # location-sensitive attention energies
        loc = jnp.stack([att_w, att_cum], axis=-1)  # [B, L, 2]
        loc = nn.Conv(cfg.att_filters, (cfg.att_kernel,), padding="SAME",
                      dtype=self.dtype, name="att_conv")(loc)
        q = nn.Dense(cfg.att_dim, use_bias=False, dtype=self.dtype, name="att_q")(att_h)
        f = nn.Dense(cfg.att_dim, use_bias=False, dtype=self.dtype, name="att_f")(loc)
        e = nn.Dense(1, use_bias=False, dtype=self.dtype, name="att_v")(
            jnp.tanh(q[:, None, :] + enc_proj + f)
        )[..., 0]
        e = jnp.where(valid, e, -1e10)
        new_att_w = jax.nn.softmax(e.astype(jnp.float32), axis=-1).astype(self.dtype)
        ctx = jnp.einsum("bl,bld->bd", new_att_w, enc)
        # decoder LSTM
        (dec_c, dec_h), _ = nn.OptimizedLSTMCell(cfg.dlstm_units, name="dec_lstm")(
            (dec_c, dec_h), jnp.concatenate([att_h, ctx], -1)
        )
        proj_in = jnp.concatenate([dec_h, ctx], -1)
        mel = nn.Dense(cfg.n_mels * cfg.reduction_factor, dtype=self.dtype,
                       name="feat_out")(proj_in)
        stop = nn.Dense(1, dtype=self.dtype, name="stop_out")(proj_in)[..., 0]
        new_carry = ((att_c, att_h), (dec_c, dec_h), new_att_w, att_cum + new_att_w)
        return new_carry, (mel, stop, new_att_w)


class Tacotron2(nn.Module):
    """forward(text, text_lengths, speech(mel), speech_lengths) -> loss."""

    cfg: Tacotron2Config
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.encoder = Taco2Encoder(cfg, dtype=self.dtype, name="encoder")
        self.enc_proj = nn.Dense(cfg.att_dim, use_bias=False, dtype=self.dtype,
                                 name="enc_proj")
        self.cell = Taco2DecoderCell(cfg, dtype=self.dtype, name="cell")
        self.postnet = [
            nn.Conv(cfg.postnet_filters if i < cfg.postnet_layers - 1 else cfg.n_mels,
                    (5,), padding="SAME", dtype=self.dtype, name=f"postnet_{i}")
            for i in range(cfg.postnet_layers)
        ]

    def _init_carry(self, b, l, d_dec):
        z = lambda: (jnp.zeros((b, d_dec)), jnp.zeros((b, d_dec)))
        return (z(), z(), jnp.zeros((b, l)), jnp.zeros((b, l)))

    def _run_postnet(self, mel):
        x = mel
        for i, conv in enumerate(self.postnet):
            x = conv(x)
            if i < len(self.postnet) - 1:
                x = jnp.tanh(x)
        return mel + x

    def decode_teacher_forced(self, enc, enc_valid, mels, deterministic=True):
        """Teacher-forced decode over the whole target [B, T, n_mels]."""
        cfg = self.cfg
        b, t, _ = mels.shape
        enc_proj = self.enc_proj(enc)
        carry = self._init_carry(b, enc.shape[1], cfg.dlstm_units)
        # inputs shifted right: step t consumes frame t-1 (zeros at t=0)
        prev = jnp.concatenate([jnp.zeros((b, 1, cfg.n_mels)), mels[:, :-1]], axis=1)

        scan = nn.scan(
            lambda cell, c, x: cell(c, x, enc, enc_proj, enc_valid, deterministic),
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=1, out_axes=1,
        )
        _, (mel_out, stop, att_ws) = scan(self.cell, carry, prev)
        return mel_out, stop, att_ws

    def __call__(
        self,
        text: jnp.ndarray,  # [B, L]
        text_lengths: jnp.ndarray,
        speech: jnp.ndarray,  # [B, T, n_mels] target log-mels
        speech_lengths: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        cfg = self.cfg
        enc = self.encoder(text, text_lengths, deterministic)
        enc_valid = make_valid_mask(text_lengths, text.shape[1])
        mel_out, stop, att_ws = self.decode_teacher_forced(
            enc, enc_valid, speech, deterministic
        )
        mel_post = self._run_postnet(mel_out)
        t_valid = make_valid_mask(speech_lengths, speech.shape[1])
        denom = jnp.maximum(jnp.sum(t_valid) * cfg.n_mels, 1.0)

        def masked_l1_mse(pred):
            diff = jnp.where(t_valid[..., None], pred - speech, 0.0)
            return (jnp.sum(jnp.abs(diff)) + jnp.sum(diff**2)) / denom

        loss_mel = masked_l1_mse(mel_out) + masked_l1_mse(mel_post)
        # stop token: 1 at the last valid frame (and beyond)
        stop_tgt = (
            jnp.arange(speech.shape[1])[None, :] >= (speech_lengths - 1)[:, None]
        ).astype(jnp.float32)
        bce = optax_sigmoid_bce(stop, stop_tgt)
        loss_stop = jnp.sum(jnp.where(t_valid, bce, 0.0)) / jnp.maximum(
            jnp.sum(t_valid), 1.0
        )
        loss = loss_mel + loss_stop
        stats = {"loss_mel": loss_mel, "loss_stop": loss_stop}
        if cfg.use_guided_attn:
            # guided attention loss (espnet2/tts/tacotron2 guided_attn_loss):
            # penalize attention mass far from the diagonal
            t_pos = jnp.arange(att_ws.shape[1])[None, :, None]
            l_pos = jnp.arange(att_ws.shape[2])[None, None, :]
            nt = jnp.maximum(speech_lengths, 1)[:, None, None]
            nl = jnp.maximum(text_lengths, 1)[:, None, None]
            w = 1.0 - jnp.exp(
                -((l_pos / nl - t_pos / nt) ** 2) / (2 * cfg.guided_attn_sigma**2)
            )
            mask = t_valid[:, :, None] & enc_valid[:, None, :]
            loss_ga = jnp.sum(jnp.where(mask, att_ws * w, 0.0)) / jnp.maximum(
                jnp.sum(mask), 1.0
            )
            loss = loss + loss_ga
            stats["loss_ga"] = loss_ga
        stats["loss"] = loss
        return loss, stats, jnp.asarray(text.shape[0], jnp.float32)

    def collect_feats(self, text, text_lengths, speech, speech_lengths):
        return {"feats": speech, "feats_lengths": speech_lengths}

    def inference(
        self, text: jnp.ndarray, text_lengths: jnp.ndarray,
        max_frames: int = 500, stop_threshold: float = 0.5,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Free-running decode -> ([B, T, n_mels] mel, [B] lengths, att)."""
        cfg = self.cfg
        enc = self.encoder(text, text_lengths, True)
        enc_valid = make_valid_mask(text_lengths, text.shape[1])
        enc_proj = self.enc_proj(enc)
        b = text.shape[0]
        carry0 = self._init_carry(b, enc.shape[1], cfg.dlstm_units)

        def scan_fn(cell, c, _):
            carry, prev, stopped, n = c
            carry, (mel, stop, att_w) = cell(carry, prev, enc, enc_proj, enc_valid, True)
            stopped_now = stopped | (jax.nn.sigmoid(stop) > stop_threshold)
            n = n + (~stopped).astype(jnp.int32)
            return (carry, mel, stopped_now, n), (mel, att_w)

        scan = nn.scan(
            scan_fn, variable_broadcast="params",
            split_rngs={"params": False, "dropout": False},
            in_axes=1, out_axes=1, length=max_frames,
        )
        init = (carry0, jnp.zeros((b, cfg.n_mels)), jnp.zeros((b,), bool),
                jnp.zeros((b,), jnp.int32))
        (_, _, _, n_frames), (mels, att) = scan(
            self.cell, init, jnp.zeros((b, max_frames, 0))
        )
        mels = self._run_postnet(mels)
        return mels, n_frames, att


def optax_sigmoid_bce(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
