"""Text-to-speech: FastSpeech2-style non-autoregressive model + Griffin-Lim.

Rebuild of espnet2/tts/fastspeech2/ (minimal-but-real): text encoder ->
variance adaptor (duration/pitch/energy predictors, trained on provided
targets like the reference recipe) -> length regulator -> decoder -> log-mel;
losses = L1 mel + MSE on log-duration/pitch/energy (fastspeech2.py loss).

The length regulator is the usual dynamic-repeat, made static-shape for XLA:
output frame t attends token i with cum_dur[i-1] <= t < cum_dur[i], computed
as a vectorized comparison (no ragged repeat).  Waveform synthesis for tests
uses Griffin-Lim over ops/frontend stft/istft (vocoders are future work).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.transformer import (
    LayerNorm,
    MultiHeadedAttention,
    PositionalEncoding,
    PositionwiseFeedForward,
    TransformerEncoderLayer,
)
from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


@dataclasses.dataclass(frozen=True)
class FastSpeech2Config:
    vocab_size: int = 100
    n_mels: int = 80
    adim: int = 128
    heads: int = 2
    eunits: int = 256
    elayers: int = 2
    dlayers: int = 2
    duration_offset: float = 1.0  # log(d + offset) regression target
    # global style tokens (espnet2/tts/gst/style_encoder.py StyleEncoder):
    # reference encoder over the target mel -> attention over learned style
    # tokens -> style vector added to every token encoding
    use_gst: bool = False
    gst_tokens: int = 10
    gst_heads: int = 4


def length_regulate(
    enc: jnp.ndarray,  # [B, L, D] token encodings
    durations: jnp.ndarray,  # [B, L] integer frame counts
    t_max: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expand tokens to frames: frame t <- token argmax_i(cum[i-1] <= t < cum[i]).

    Returns ([B, t_max, D] frames, [B] frame lengths).
    """
    cum = jnp.cumsum(durations, axis=1)  # [B, L]
    frame_pos = jnp.arange(t_max)[None, :, None]  # [1, T, 1]
    # token index for frame t = number of cum entries <= t
    tok_idx = jnp.sum((cum[:, None, :] <= frame_pos).astype(jnp.int32), axis=2)  # [B, T]
    tok_idx = jnp.clip(tok_idx, 0, enc.shape[1] - 1)
    frames = jnp.take_along_axis(enc, tok_idx[..., None], axis=1)
    lengths = cum[:, -1]
    valid = jnp.arange(t_max)[None, :] < lengths[:, None]
    return jnp.where(valid[..., None], frames, 0.0), lengths


class VariancePredictor(nn.Module):
    """Conv1d x2 -> scalar per token (fastspeech2 duration/pitch/energy)."""

    hidden: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid, deterministic=True):
        h = nn.Conv(self.hidden, (3,), padding="SAME", dtype=self.dtype, name="conv1")(x)
        h = jax.nn.relu(nn.LayerNorm(dtype=self.dtype, name="ln1")(h))
        h = nn.Conv(self.hidden, (3,), padding="SAME", dtype=self.dtype, name="conv2")(h)
        h = jax.nn.relu(nn.LayerNorm(dtype=self.dtype, name="ln2")(h))
        out = nn.Dense(1, dtype=self.dtype, name="out")(h)[..., 0]
        return jnp.where(valid, out, 0.0)


class StyleEncoder(nn.Module):
    """Global style tokens (espnet2/tts/gst/style_encoder.py): conv reference
    encoder + GRU over the target mel -> multi-head attention over learned
    style token embeddings -> style vector [B, adim]."""

    adim: int
    n_tokens: int = 10
    heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray, mel_lengths: jnp.ndarray) -> jnp.ndarray:
        x = mel[..., None]  # [B, T, F, 1]
        for i, ch in enumerate((32, 64)):
            x = jax.nn.relu(
                nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME",
                        dtype=self.dtype, name=f"ref_conv{i}")(x)
            )
        b, t, f, c = x.shape
        h = x.reshape(b, t, f * c)
        h = nn.RNN(nn.GRUCell(self.adim), name="ref_gru")(h)
        # final valid state per utterance (conv halves T twice)
        idx = jnp.clip((mel_lengths + 3) // 4 - 1, 0, t - 1)
        query = h[jnp.arange(b), idx]  # [B, adim]
        tokens = self.param(
            "style_tokens", nn.initializers.normal(0.5),
            (self.n_tokens, self.adim),
        )
        q = nn.Dense(self.adim, dtype=self.dtype, name="q_proj")(query)
        k = nn.Dense(self.adim, dtype=self.dtype, name="k_proj")(
            jnp.tanh(tokens)
        )
        v = nn.Dense(self.adim, dtype=self.dtype, name="v_proj")(
            jnp.tanh(tokens)
        )
        hd = self.adim // self.heads
        qh = q.reshape(b, self.heads, hd)
        kh = k.reshape(self.n_tokens, self.heads, hd)
        vh = v.reshape(self.n_tokens, self.heads, hd)
        att = jax.nn.softmax(
            jnp.einsum("bhd,nhd->bhn", qh, kh) / jnp.sqrt(hd), axis=-1
        )
        style = jnp.einsum("bhn,nhd->bhd", att, vh).reshape(b, self.adim)
        return style


class FastSpeech2(nn.Module):
    cfg: FastSpeech2Config
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.embed = nn.Embed(cfg.vocab_size, cfg.adim, dtype=self.dtype, name="embed")
        self.enc_pos = PositionalEncoding(0.1, dtype=self.dtype, name="enc_pos")
        self.encoder_layers = [
            TransformerEncoderLayer(cfg.heads, cfg.eunits, 0.1, dtype=self.dtype,
                                    name=f"enc_{i}")
            for i in range(cfg.elayers)
        ]
        self.duration_predictor = VariancePredictor(cfg.adim, dtype=self.dtype, name="dur")
        self.pitch_predictor = VariancePredictor(cfg.adim, dtype=self.dtype, name="pitch")
        self.energy_predictor = VariancePredictor(cfg.adim, dtype=self.dtype, name="energy")
        self.pitch_embed = nn.Dense(cfg.adim, dtype=self.dtype, name="pitch_embed")
        self.energy_embed = nn.Dense(cfg.adim, dtype=self.dtype, name="energy_embed")
        self.dec_pos = PositionalEncoding(0.1, dtype=self.dtype, name="dec_pos")
        self.decoder_layers = [
            TransformerEncoderLayer(cfg.heads, cfg.eunits, 0.1, dtype=self.dtype,
                                    name=f"dec_{i}")
            for i in range(cfg.dlayers)
        ]
        self.mel_out = nn.Dense(cfg.n_mels, dtype=self.dtype, name="mel_out")
        if cfg.use_gst:
            self.gst = StyleEncoder(cfg.adim, cfg.gst_tokens, cfg.gst_heads,
                                    dtype=self.dtype, name="gst")

    def encode_text(self, text, text_lengths, deterministic=True):
        x = self.embed(jnp.clip(text, 0, self.cfg.vocab_size - 1))
        x = self.enc_pos(x, deterministic)
        valid = make_valid_mask(text_lengths, text.shape[1])
        for layer in self.encoder_layers:
            x = layer(x, valid[:, None, :], deterministic)
        return jnp.where(valid[..., None], x, 0.0), valid

    def _decode(self, frames, frame_lengths, deterministic=True):
        t = frames.shape[1]
        valid = jnp.arange(t)[None, :] < frame_lengths[:, None]
        x = self.dec_pos(frames, deterministic)
        for layer in self.decoder_layers:
            x = layer(x, valid[:, None, :], deterministic)
        mel = self.mel_out(x)
        return jnp.where(valid[..., None], mel, 0.0)

    def __call__(
        self,
        text: jnp.ndarray,  # [B, L]
        text_lengths: jnp.ndarray,
        speech: jnp.ndarray,  # [B, T, n_mels] target log-mel
        speech_lengths: jnp.ndarray,
        durations: jnp.ndarray,  # [B, L] frames per token
        durations_lengths: Optional[jnp.ndarray] = None,
        pitch: Optional[jnp.ndarray] = None,  # [B, L]
        energy: Optional[jnp.ndarray] = None,  # [B, L]
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        cfg = self.cfg
        enc, tvalid = self.encode_text(text, text_lengths, deterministic)
        if cfg.use_gst:
            style = self.gst(speech, speech_lengths)  # [B, adim]
            enc = jnp.where(tvalid[..., None], enc + style[:, None, :], 0.0)

        d_pred = self.duration_predictor(enc, tvalid, deterministic)
        d_target = jnp.log(jnp.where(tvalid, durations, 0) + cfg.duration_offset)
        loss_dur = jnp.sum(jnp.where(tvalid, (d_pred - d_target) ** 2, 0.0)) / jnp.maximum(
            jnp.sum(tvalid), 1
        )

        stats = {"loss_duration": loss_dur}
        loss_var = loss_dur
        h = enc
        if pitch is not None:
            p_pred = self.pitch_predictor(enc, tvalid, deterministic)
            loss_p = jnp.sum(jnp.where(tvalid, (p_pred - pitch) ** 2, 0.0)) / jnp.maximum(
                jnp.sum(tvalid), 1
            )
            stats["loss_pitch"] = loss_p
            loss_var = loss_var + loss_p
            h = h + self.pitch_embed(pitch[..., None])
        if energy is not None:
            e_pred = self.energy_predictor(enc, tvalid, deterministic)
            loss_e = jnp.sum(jnp.where(tvalid, (e_pred - energy) ** 2, 0.0)) / jnp.maximum(
                jnp.sum(tvalid), 1
            )
            stats["loss_energy"] = loss_e
            loss_var = loss_var + loss_e
            h = h + self.energy_embed(energy[..., None])

        frames, frame_lengths = length_regulate(
            h, jnp.where(tvalid, durations, 0), speech.shape[1]
        )
        mel = self._decode(frames, jnp.minimum(frame_lengths, speech.shape[1]), deterministic)
        mvalid = make_valid_mask(speech_lengths, speech.shape[1])[..., None]
        loss_mel = jnp.sum(jnp.where(mvalid, jnp.abs(mel - speech), 0.0)) / jnp.maximum(
            jnp.sum(mvalid) * cfg.n_mels, 1
        )
        stats["loss_mel"] = loss_mel
        loss = loss_mel + loss_var
        stats["loss"] = loss
        return loss, stats, jnp.asarray(text.shape[0], jnp.float32)

    def inference(
        self, text: jnp.ndarray, text_lengths: jnp.ndarray, t_max: int = 1000,
        speed: float = 1.0, ref_mel: Optional[jnp.ndarray] = None,
        ref_mel_lengths: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Synthesize log-mel from text with predicted variances.

        With use_gst, ``ref_mel`` conditions the style (style transfer); when
        absent the style contribution is omitted (neutral style)."""
        enc, tvalid = self.encode_text(text, text_lengths, True)
        if self.cfg.use_gst and ref_mel is not None:
            style = self.gst(ref_mel, ref_mel_lengths)
            enc = jnp.where(tvalid[..., None], enc + style[:, None, :], 0.0)
        d_pred = self.duration_predictor(enc, tvalid, True)
        dur = jnp.round(
            (jnp.exp(d_pred) - self.cfg.duration_offset) / speed
        ).astype(jnp.int32)
        dur = jnp.where(tvalid, jnp.maximum(dur, 1), 0)
        p_pred = self.pitch_predictor(enc, tvalid, True)
        e_pred = self.energy_predictor(enc, tvalid, True)
        h = enc + self.pitch_embed(p_pred[..., None]) + self.energy_embed(e_pred[..., None])
        frames, frame_lengths = length_regulate(h, dur, t_max)
        mel = self._decode(frames, jnp.minimum(frame_lengths, t_max), True)
        return mel, jnp.minimum(frame_lengths, t_max)


def griffin_lim(
    log_mel_or_power: jnp.ndarray,
    n_fft: int = 512,
    hop_length: int = 128,
    n_iters: int = 16,
    length: Optional[int] = None,
    from_linear_power: bool = True,
    key=None,
) -> jnp.ndarray:
    """Phase reconstruction from a linear power spectrogram [B, T, F]
    (utils griffin_lim analog for vocoder-less synthesis)."""
    from llm_guided_asr_tpu.ops.frontend import istft, stft

    mag = jnp.sqrt(jnp.maximum(log_mel_or_power, 0.0)) if from_linear_power else log_mel_or_power
    b, t, f = mag.shape
    if key is None:
        key = jax.random.PRNGKey(0)
    phase = jax.random.uniform(key, (b, t, f)) * 2 * jnp.pi
    spec = mag * jnp.exp(1j * phase)
    n = length or ((t - 1) * hop_length)
    for _ in range(n_iters):
        wav = istft(spec, n_fft=n_fft, hop_length=hop_length, length=n)
        re = stft(wav, n_fft=n_fft, hop_length=hop_length)
        re = re[:, :t]
        spec = mag * jnp.exp(1j * jnp.angle(re))
    return istft(spec, n_fft=n_fft, hop_length=hop_length, length=n)


@dataclasses.dataclass(frozen=True)
class TransformerTTSConfig:
    """Transformer-TTS (espnet/nets/pytorch_backend/e2e_tts_transformer.py):
    AR encoder-decoder with mel prenet, stop-token head, postnet, and the
    diagonal guided-attention loss on the cross-attention maps."""

    vocab_size: int = 100
    n_mels: int = 80
    adim: int = 128
    heads: int = 2
    eunits: int = 256
    elayers: int = 2
    dlayers: int = 2
    prenet_units: int = 64
    postnet_layers: int = 3
    postnet_chans: int = 64
    postnet_filts: int = 5
    bce_pos_weight: float = 5.0  # stop-token class imbalance
    use_guided_attn: bool = True
    guided_sigma: float = 0.4
    guided_lambda: float = 1.0


def guided_attention_loss(attn, text_lengths, mel_lengths, sigma: float):
    """GuidedMultiHeadAttentionLoss (e2e_tts_transformer.py): penalize
    cross-attention mass far from the diagonal.  attn: [B, H, T_mel, L_text]."""
    b, h, t, l = attn.shape
    ti = jnp.arange(t)[None, :, None]
    li = jnp.arange(l)[None, None, :]
    tl = jnp.maximum(mel_lengths, 1)[:, None, None].astype(jnp.float32)
    ll = jnp.maximum(text_lengths, 1)[:, None, None].astype(jnp.float32)
    w = 1.0 - jnp.exp(-((li / ll - ti / tl) ** 2) / (2 * sigma ** 2))  # [B,T,L]
    valid = (
        (ti < mel_lengths[:, None, None]) & (li < text_lengths[:, None, None])
    )
    w = jnp.where(valid, w, 0.0)[:, None]  # [B,1,T,L]
    return jnp.sum(attn * w) / jnp.maximum(jnp.sum(valid) * h, 1)


class TransformerTTS(nn.Module):
    cfg: TransformerTTSConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.embed = nn.Embed(cfg.vocab_size, cfg.adim, dtype=self.dtype,
                              name="embed")
        self.enc_pos = PositionalEncoding(0.1, dtype=self.dtype, name="enc_pos")
        self.encoder_layers = [
            TransformerEncoderLayer(cfg.heads, cfg.eunits, 0.1,
                                    dtype=self.dtype, name=f"enc_{i}")
            for i in range(cfg.elayers)
        ]
        self.prenet1 = nn.Dense(cfg.prenet_units, dtype=self.dtype, name="prenet1")
        self.prenet2 = nn.Dense(cfg.prenet_units, dtype=self.dtype, name="prenet2")
        self.prenet_out = nn.Dense(cfg.adim, dtype=self.dtype, name="prenet_out")
        self.prenet_drop = nn.Dropout(0.5)
        self.dec_pos = PositionalEncoding(0.1, dtype=self.dtype, name="dec_pos")
        self.self_attns = [
            MultiHeadedAttention(cfg.heads, 0.0, dtype=self.dtype,
                                 name=f"dec_self_{i}")
            for i in range(cfg.dlayers)
        ]
        self.cross_attns = [
            MultiHeadedAttention(cfg.heads, 0.0, dtype=self.dtype,
                                 name=f"dec_cross_{i}")
            for i in range(cfg.dlayers)
        ]
        self.dec_ffns = [
            PositionwiseFeedForward(cfg.eunits, 0.1, dtype=self.dtype,
                                    name=f"dec_ffn_{i}")
            for i in range(cfg.dlayers)
        ]
        self.dec_norms1 = [LayerNorm(dtype=self.dtype, name=f"dn1_{i}")
                           for i in range(cfg.dlayers)]
        self.dec_norms2 = [LayerNorm(dtype=self.dtype, name=f"dn2_{i}")
                           for i in range(cfg.dlayers)]
        self.dec_norms3 = [LayerNorm(dtype=self.dtype, name=f"dn3_{i}")
                           for i in range(cfg.dlayers)]
        self.mel_out = nn.Dense(cfg.n_mels, dtype=self.dtype, name="mel_out")
        self.stop_out = nn.Dense(1, dtype=self.dtype, name="stop_out")
        from llm_guided_asr_tpu.models.svs import Postnet

        self.postnet = Postnet(cfg.n_mels, cfg.postnet_layers,
                               cfg.postnet_chans, cfg.postnet_filts,
                               dtype=self.dtype, name="postnet")

    def _encode(self, text, text_lengths, deterministic):
        x = self.embed(jnp.clip(text, 0, self.cfg.vocab_size - 1))
        x = self.enc_pos(x, deterministic)
        valid = make_valid_mask(text_lengths, text.shape[1])
        for layer in self.encoder_layers:
            x = layer(x, valid[:, None, :], deterministic)
        return jnp.where(valid[..., None], x, 0.0), valid

    def _prenet(self, mel, deterministic):
        # tacotron prenet: dropout active even at inference (reference keeps
        # prenet dropout on to break AR repetition); here deterministic
        # controls it uniformly (documented deviation)
        h = self.prenet_drop(jax.nn.relu(self.prenet1(mel)),
                             deterministic=deterministic)
        h = self.prenet_drop(jax.nn.relu(self.prenet2(h)),
                             deterministic=deterministic)
        return self.prenet_out(h)

    def _decode_frames(self, enc, enc_valid, mel_in, mel_lengths,
                       deterministic):
        from llm_guided_asr_tpu.utils.masks import causal_attn_mask

        t = mel_in.shape[1]
        x = self._prenet(mel_in, deterministic)
        x = self.dec_pos(x, deterministic)
        self_mask = causal_attn_mask(mel_lengths, t)
        cross_mask = enc_valid[:, None, :]
        attns = []
        for i in range(self.cfg.dlayers):
            h = self.dec_norms1[i](x)
            x = x + self.self_attns[i](h, h, h, self_mask, deterministic)
            h = self.dec_norms2[i](x)
            out, w = self.cross_attns[i](
                h, enc, enc, cross_mask, deterministic, return_weights=True
            )
            attns.append(w)  # [B, H, T_mel, L_text]
            x = x + out
            h = self.dec_norms3[i](x)
            x = x + self.dec_ffns[i](h, deterministic)
        before = self.mel_out(x)
        stop_logits = self.stop_out(x)[..., 0]
        after = self.postnet(before, deterministic)
        return before, after, stop_logits, attns

    def __call__(
        self,
        text, text_lengths,
        speech, speech_lengths,  # [B, T, n_mels] target
        deterministic: bool = True,
    ):
        cfg = self.cfg
        enc, enc_valid = self._encode(text, text_lengths, deterministic)
        # teacher forcing: input = target shifted right with a zero frame
        mel_in = jnp.concatenate(
            [jnp.zeros_like(speech[:, :1]), speech[:, :-1]], axis=1
        )
        before, after, stop_logits, attns = self._decode_frames(
            enc, enc_valid, mel_in, speech_lengths, deterministic
        )
        t = speech.shape[1]
        mvalid = make_valid_mask(speech_lengths, t)[..., None]
        n = jnp.maximum(jnp.sum(mvalid) * cfg.n_mels, 1)
        l1 = (jnp.sum(jnp.where(mvalid, jnp.abs(before - speech), 0.0))
              + jnp.sum(jnp.where(mvalid, jnp.abs(after - speech), 0.0))) / n
        mse = (jnp.sum(jnp.where(mvalid, (before - speech) ** 2, 0.0))
               + jnp.sum(jnp.where(mvalid, (after - speech) ** 2, 0.0))) / n
        # stop targets: 1 at the last valid frame, 0 elsewhere
        pos = jnp.arange(t)[None, :]
        stop_tgt = (pos == (speech_lengths - 1)[:, None]).astype(jnp.float32)
        svalid = make_valid_mask(speech_lengths, t)
        z = stop_logits.astype(jnp.float32)
        bce = jnp.maximum(z, 0) - z * stop_tgt + jnp.log1p(jnp.exp(-jnp.abs(z)))
        bce = jnp.where(stop_tgt > 0, cfg.bce_pos_weight * bce, bce)
        loss_stop = jnp.sum(jnp.where(svalid, bce, 0.0)) / jnp.maximum(
            jnp.sum(svalid), 1
        )
        loss = l1 + mse + loss_stop
        stats = {"loss_mel": l1, "loss_mse": mse, "loss_stop": loss_stop}
        if cfg.use_guided_attn:
            # the reference applies the loss to the last num_layers_applied
            # cross-attention maps (e2e_tts_transformer.py); here: all layers
            loss_ga = jnp.mean(
                jnp.stack([
                    guided_attention_loss(
                        a.astype(jnp.float32), text_lengths, speech_lengths,
                        cfg.guided_sigma,
                    )
                    for a in attns
                ])
            )
            loss = loss + cfg.guided_lambda * loss_ga
            stats["loss_guided_attn"] = loss_ga
        stats["loss"] = loss
        return loss, stats, jnp.asarray(text.shape[0], jnp.float32)

    def inference(self, text, text_lengths, t_max: int = 500,
                  stop_threshold: float = 0.5):
        """AR greedy synthesis with stop-token termination (lax.scan over a
        static t_max buffer; frames after the stop are masked out)."""
        cfg = self.cfg
        enc, enc_valid = self._encode(text, text_lengths, True)
        b = text.shape[0]

        mel_buf = jnp.zeros((b, t_max, cfg.n_mels), self.dtype)
        # full-prefix recompute per frame (parity-first; a KV-cached step
        # mirrors search/cached_decoder.py if this becomes hot)
        def step(carry, i):
            mel_buf, stopped, lengths = carry
            mel_in = jnp.concatenate(
                [jnp.zeros_like(mel_buf[:, :1]), mel_buf[:, :-1]], axis=1
            )
            before, after, stop_logits, _ = self._decode_frames(
                enc, enc_valid, mel_in, jnp.full((b,), t_max, jnp.int32), True
            )
            frame = after[:, i]
            mel_buf = jax.lax.dynamic_update_slice(
                mel_buf, frame[:, None], (0, i, 0)
            )
            stop_now = jax.nn.sigmoid(stop_logits[:, i]) > stop_threshold
            new_stopped = jnp.logical_or(stopped, stop_now)
            lengths = jnp.where(
                jnp.logical_and(~stopped, new_stopped), i + 1, lengths
            )
            return (mel_buf, new_stopped, lengths), None

        init = (mel_buf, jnp.zeros((b,), bool), jnp.full((b,), t_max, jnp.int32))
        (mel_buf, stopped, lengths), _ = jax.lax.scan(
            step, init, jnp.arange(t_max)
        )
        valid = jnp.arange(t_max)[None, :] < lengths[:, None]
        return jnp.where(valid[..., None], mel_buf, 0.0), lengths
