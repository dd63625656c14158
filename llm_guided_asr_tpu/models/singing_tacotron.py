"""Singing-Tacotron: duration-informed attention SVS (VERDICT r4 missing #3).

Rebuild of espnet2/svs/singing_tacotron/ (Wang et al. 2022,
arXiv:2202.07907): a Tacotron2-family autoregressive mel decoder whose
location-sensitive attention is modulated by a **global transition token**
predicted from the musical score's note durations — "global duration control
attention" (GDCA).

Reference spec:
- singing_tacotron.py:330-460 forward: phone/midi/duration ids are each
  embedded and SUMMED (input_emb = label+midi+duration embeddings, :420-424);
  input_emb feeds the conv+BiLSTM content encoder; the duration embedding
  alone feeds Duration_Encoder.
- encoder.py:179-264 Duration_Encoder: Dense(24) -> [ReLU Conv(32,3)]x2 ->
  ReLU -> Dense(1) -> tanh -> (x+1)/2, yielding a per-score-position
  transition token in (0, 1).
- attentions.py:1827-1967 GDCAttLoc: standard location attention energies,
  then w <- ((1 - tt_shift) * att_prev_shift + tt * att_prev) * w, clamped
  at 1e-6 and L1-renormalized — tt near 0 holds the attention head on the
  current note for its scored duration; tt near 1 lets it advance.
- decoder.py:146-240: prenet -> attention LSTM stack -> feat/stop heads,
  cumulative attention carried when cumulate_att_w (default True).

TPU mapping mirrors models/tacotron2.py: the frame recurrence is ONE
``nn.scan`` over the mel frame axis with static shapes; the GDCA reweighting
is three vector ops inside the cell.  Losses: masked L1+MSE on pre/postnet
mels + stop BCE + guided attention (Tacotron2Loss + GuidedAttentionLoss).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.tacotron2 import optax_sigmoid_bce
from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


@dataclasses.dataclass(frozen=True)
class SingingTacotronConfig:
    vocab_size: int = 100
    midi_dim: int = 129           # singing_tacotron.py:54 midi_dim
    duration_dim: int = 500       # :55 duration ids are embedded, not scalar
    n_mels: int = 80
    embed_dim: int = 128
    econv_layers: int = 2
    econv_filters: int = 128
    elstm_units: int = 64         # per direction
    att_dim: int = 64
    att_filters: int = 8
    att_kernel: int = 15
    prenet_units: int = 64
    dlstm_units: int = 256
    postnet_layers: int = 3
    postnet_filters: int = 128
    cumulate_att_w: bool = True   # singing_tacotron.py:66 default
    use_guided_attn: bool = True
    guided_attn_sigma: float = 0.4
    loss_type: str = "L1"         # "L1" | "L2" | "L1+L2" (:151)


class ScoreEncoder(nn.Module):
    """Conv stack + BiLSTM over pre-summed score embeddings
    (singing_tacotron/encoder.py Encoder with input_layer='linear' over the
    embedding sum)."""

    cfg: SingingTacotronConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, emb, valid, deterministic=True):
        cfg = self.cfg
        x = emb
        for i in range(cfg.econv_layers):
            h = nn.Conv(cfg.econv_filters, (5,), padding="SAME",
                        dtype=self.dtype, name=f"conv_{i}")(x)
            h = nn.LayerNorm(dtype=self.dtype, name=f"ln_{i}")(h)
            x = jax.nn.relu(h)
            x = jnp.where(valid[..., None], x, 0.0)
        fwd = nn.RNN(nn.OptimizedLSTMCell(cfg.elstm_units), name="lstm_f")(x)
        bwd = nn.RNN(nn.OptimizedLSTMCell(cfg.elstm_units), reverse=True,
                     keep_order=True, name="lstm_b")(x)
        x = jnp.concatenate([fwd, bwd], axis=-1)
        return jnp.where(valid[..., None], x, 0.0)


class DurationEncoder(nn.Module):
    """Duration embeddings -> transition token in (0, 1)
    (encoder.py:179-250 Duration_Encoder)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, dur_emb):
        h = nn.Dense(24, dtype=self.dtype, name="dense24")(dur_emb)
        h = jax.nn.relu(h)
        h = nn.Conv(32, (3,), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv1")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(32, (3,), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = jax.nn.relu(h)
        h = jnp.tanh(nn.Dense(1, dtype=self.dtype, name="dense1")(h))
        return (h + 1.0) / 2.0  # [B, L, 1]


class GDCADecoderCell(nn.Module):
    """One mel frame step with global-duration-control attention."""

    cfg: SingingTacotronConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, prev_frame, enc, enc_proj, trans_token, valid,
                 deterministic=True):
        cfg = self.cfg
        (att_c, att_h), (dec_c, dec_h), prev_att, att_cum = carry
        pre = prev_frame
        for i in range(2):
            pre = jax.nn.relu(
                nn.Dense(cfg.prenet_units, dtype=self.dtype,
                         name=f"prenet_{i}")(pre)
            )
        ctx_prev = jnp.einsum("bl,bld->bd", prev_att, enc)
        (att_c, att_h), _ = nn.OptimizedLSTMCell(
            cfg.dlstm_units, name="att_lstm"
        )((att_c, att_h), jnp.concatenate([pre, ctx_prev], -1))
        # location features come from the carried attention state exactly as
        # GDCAttLoc does: att_prev is the cumulated weights when
        # cumulate_att_w.  Reference cumulation EXCLUDES the one-hot init:
        # decoder.py:212-215 sets prev_att_w = att_w after step 1 (the None
        # branch), so att_prev(t) = a0 for t=1 and sum_{i<t} w_i after —
        # att_cum therefore starts at zero and the first step falls back to
        # the one-hot prev_att (a later cum is never all-zero: each step
        # adds a normalized distribution).
        if cfg.cumulate_att_w:
            first = jnp.sum(att_cum, -1, keepdims=True) == 0.0
            loc_src = jnp.where(first, prev_att, att_cum)
        else:
            loc_src = prev_att
        loc = nn.Conv(cfg.att_filters, (cfg.att_kernel,), padding="SAME",
                      use_bias=False, dtype=self.dtype,
                      name="att_conv")(loc_src[..., None])
        q = nn.Dense(cfg.att_dim, use_bias=False, dtype=self.dtype,
                     name="att_q")(att_h)
        f = nn.Dense(cfg.att_dim, use_bias=False, dtype=self.dtype,
                     name="att_f")(loc)
        e = nn.Dense(1, use_bias=False, dtype=self.dtype, name="att_v")(
            jnp.tanh(q[:, None, :] + enc_proj + f)
        )[..., 0]
        e = jnp.where(valid, e, -1e10)
        w = jax.nn.softmax(e.astype(jnp.float32), axis=-1)
        # --- GDCA (attentions.py:1953-1961) -----------------------------
        # att_prev_shift[l] = att_prev[l-1]; tt_shift likewise.  tt ~ 0
        # keeps mass where it is, tt ~ 1 pushes it one score position on.
        tt = trans_token[..., 0]  # [B, L]
        gdca_prev = loc_src  # same tensor the reference modulates
        prev_shift = jnp.pad(gdca_prev, ((0, 0), (1, 0)))[:, :-1]
        tt_shift = jnp.pad(tt, ((0, 0), (1, 0)))[:, :-1]
        w = ((1.0 - tt_shift) * prev_shift + tt * gdca_prev) * w
        w = jnp.maximum(w, 1e-6)
        w = jnp.where(valid, w, 0.0)
        new_att = (w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-6)).astype(
            self.dtype
        )
        # ----------------------------------------------------------------
        ctx = jnp.einsum("bl,bld->bd", new_att, enc)
        (dec_c, dec_h), _ = nn.OptimizedLSTMCell(
            cfg.dlstm_units, name="dec_lstm"
        )((dec_c, dec_h), jnp.concatenate([att_h, ctx], -1))
        proj_in = jnp.concatenate([dec_h, ctx], -1)
        mel = nn.Dense(cfg.n_mels, dtype=self.dtype, name="feat_out")(proj_in)
        stop = nn.Dense(1, dtype=self.dtype, name="stop_out")(proj_in)[..., 0]
        new_carry = ((att_c, att_h), (dec_c, dec_h), new_att,
                     att_cum + new_att)
        return new_carry, (mel, stop, new_att)


class SingingTacotron(nn.Module):
    """forward(text, text_lengths, speech(mel), speech_lengths, durations,
    ..., midi, ...) -> (loss, stats, weight) — svs task signature."""

    cfg: SingingTacotronConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.phone_embed = nn.Embed(cfg.vocab_size, cfg.embed_dim,
                                    dtype=self.dtype, name="phone_embed")
        self.midi_embed = nn.Embed(cfg.midi_dim, cfg.embed_dim,
                                   dtype=self.dtype, name="midi_embed")
        self.dur_embed = nn.Embed(cfg.duration_dim, cfg.embed_dim,
                                  dtype=self.dtype, name="dur_embed")
        self.encoder = ScoreEncoder(cfg, dtype=self.dtype, name="encoder")
        self.duration_encoder = DurationEncoder(dtype=self.dtype,
                                                name="duration_encoder")
        self.enc_proj = nn.Dense(cfg.att_dim, use_bias=False,
                                 dtype=self.dtype, name="enc_proj")
        self.cell = GDCADecoderCell(cfg, dtype=self.dtype, name="cell")
        self.postnet = [
            nn.Conv(
                cfg.postnet_filters if i < cfg.postnet_layers - 1 else cfg.n_mels,
                (5,), padding="SAME", dtype=self.dtype, name=f"postnet_{i}",
            )
            for i in range(cfg.postnet_layers)
        ]

    def _encode(self, text, text_lengths, midi, durations, deterministic):
        cfg = self.cfg
        valid = make_valid_mask(text_lengths, text.shape[1])
        lab = self.phone_embed(jnp.clip(text, 0, cfg.vocab_size - 1))
        mid = self.midi_embed(jnp.clip(midi, 0, cfg.midi_dim - 1))
        dur = self.dur_embed(jnp.clip(durations, 0, cfg.duration_dim - 1))
        enc = self.encoder(lab + mid + dur, valid, deterministic)
        trans_token = self.duration_encoder(dur)
        return enc, trans_token, valid

    def _run_postnet(self, mel):
        x = mel
        for i, conv in enumerate(self.postnet):
            x = conv(x)
            if i < len(self.postnet) - 1:
                x = jnp.tanh(x)
        return mel + x

    def _init_carry(self, b, l):
        d = self.cfg.dlstm_units
        z = lambda: (jnp.zeros((b, d)), jnp.zeros((b, d)))
        # initial attention: all mass on position 0 (attentions.py:1918-1920);
        # the cumulative carry starts EMPTY — the reference never folds this
        # one-hot init into prev_att_w (decoder.py:212-215, see cell)
        a0 = jnp.zeros((b, l)).at[:, 0].set(1.0)
        return (z(), z(), a0, jnp.zeros((b, l)))

    def decode_teacher_forced(self, enc, trans_token, enc_valid, mels,
                              deterministic=True):
        cfg = self.cfg
        b = mels.shape[0]
        enc_proj = self.enc_proj(enc)
        carry = self._init_carry(b, enc.shape[1])
        prev = jnp.concatenate(
            [jnp.zeros((b, 1, cfg.n_mels)), mels[:, :-1]], axis=1
        )
        scan = nn.scan(
            lambda cell, c, x: cell(c, x, enc, enc_proj, trans_token,
                                    enc_valid, deterministic),
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=1, out_axes=1,
        )
        _, (mel_out, stop, att_ws) = scan(self.cell, carry, prev)
        return mel_out, stop, att_ws

    def __call__(
        self,
        text: jnp.ndarray,            # [B, L] phone/label ids
        text_lengths: jnp.ndarray,
        speech: jnp.ndarray,          # [B, T, n_mels] target log-mels
        speech_lengths: jnp.ndarray,
        durations: jnp.ndarray,       # [B, L] score duration ids
        durations_lengths=None,
        midi: jnp.ndarray = None,     # [B, L] note ids
        midi_lengths=None,
        pitch=None,
        pitch_lengths=None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        cfg = self.cfg
        if midi is None:
            midi = jnp.zeros_like(text)
        enc, trans_token, enc_valid = self._encode(
            text, text_lengths, midi, durations, deterministic
        )
        mel_out, stop, att_ws = self.decode_teacher_forced(
            enc, trans_token, enc_valid, speech, deterministic
        )
        mel_post = self._run_postnet(mel_out)
        t_valid = make_valid_mask(speech_lengths, speech.shape[1])
        denom = jnp.maximum(jnp.sum(t_valid) * cfg.n_mels, 1.0)

        def masked(pred, power):
            diff = jnp.where(t_valid[..., None], pred - speech, 0.0)
            return jnp.sum(jnp.abs(diff) ** power) / denom

        l1 = masked(mel_out, 1) + masked(mel_post, 1)
        l2 = masked(mel_out, 2) + masked(mel_post, 2)
        if cfg.loss_type == "L1":
            loss_mel = l1
        elif cfg.loss_type == "L2":
            loss_mel = l2
        else:
            loss_mel = l1 + l2
        stop_tgt = (
            jnp.arange(speech.shape[1])[None, :] >= (speech_lengths - 1)[:, None]
        ).astype(jnp.float32)
        bce = optax_sigmoid_bce(stop, stop_tgt)
        loss_stop = jnp.sum(jnp.where(t_valid, bce, 0.0)) / jnp.maximum(
            jnp.sum(t_valid), 1.0
        )
        loss = loss_mel + loss_stop
        stats = {"l1_loss": l1, "mse_loss": l2, "bce_loss": loss_stop}
        if cfg.use_guided_attn:
            t_pos = jnp.arange(att_ws.shape[1])[None, :, None]
            l_pos = jnp.arange(att_ws.shape[2])[None, None, :]
            nt = jnp.maximum(speech_lengths, 1)[:, None, None]
            nl = jnp.maximum(text_lengths, 1)[:, None, None]
            w = 1.0 - jnp.exp(
                -((l_pos / nl - t_pos / nt) ** 2)
                / (2 * cfg.guided_attn_sigma**2)
            )
            mask = t_valid[:, :, None] & enc_valid[:, None, :]
            loss_ga = jnp.sum(jnp.where(mask, att_ws * w, 0.0)) / jnp.maximum(
                jnp.sum(mask), 1.0
            )
            loss = loss + loss_ga
            stats["attn_loss"] = loss_ga
        stats["loss"] = loss
        return loss, stats, jnp.asarray(text.shape[0], jnp.float32)

    def collect_feats(self, text, text_lengths, speech, speech_lengths,
                      *args, **kwargs):
        return {"feats": speech, "feats_lengths": speech_lengths}

    def inference(
        self, text, text_lengths, durations, midi=None, max_frames: int = 500,
        stop_threshold: float = 0.5,
    ):
        """Free-running GDCA decode -> (mel [B,T,n_mels], lengths, att)."""
        cfg = self.cfg
        if midi is None:
            midi = jnp.zeros_like(text)
        enc, trans_token, enc_valid = self._encode(
            text, text_lengths, midi, durations, True
        )
        enc_proj = self.enc_proj(enc)
        b = text.shape[0]
        carry0 = self._init_carry(b, enc.shape[1])

        def scan_fn(cell, c, _):
            carry, prev, stopped, n = c
            carry, (mel, stop, att_w) = cell(
                carry, prev, enc, enc_proj, trans_token, enc_valid, True
            )
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
        return self._run_postnet(mels), n_frames, att
