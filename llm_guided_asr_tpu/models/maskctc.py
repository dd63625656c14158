"""Mask-CTC: non-autoregressive ASR with iterative mask refinement.

Rebuild of espnet2/asr/maskctc_model.py (MaskCTCModel + MaskCTCInference)
and the MLM decoder (espnet2/asr/decoder/mlm_decoder.py):

- training: CTC loss + conditional-MLM loss where a random subset of target
  tokens is replaced by <mask> (= vocab_size, appended token) and the decoder
  (bidirectional self-attention + cross-attention) predicts the originals;
- inference: greedy CTC; tokens whose CTC posterior is below a confidence
  threshold are masked and filled in over K iterations, highest-confidence
  predictions first — entirely on device.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.conformer import ConformerConfig
from llm_guided_asr_tpu.models.transformer import DecoderLayer, PositionalEncoding
from llm_guided_asr_tpu.models.transformer_decoder import TransformerDecoderConfig
from llm_guided_asr_tpu.models.asr_model import ASRModelConfig
from llm_guided_asr_tpu.ops.frontend import default_frontend, global_mvn, utterance_mvn
from llm_guided_asr_tpu.ops.losses import accuracy, ctc_loss, label_smoothing_loss
from llm_guided_asr_tpu.ops.specaug import specaug
from llm_guided_asr_tpu.search.greedy import ctc_greedy_decode
from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


class MLMDecoder(nn.Module):
    """Bidirectional (non-causal) transformer decoder (mlm_decoder.py)."""

    vocab_size: int  # includes the <mask> token
    cfg: TransformerDecoderConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, memory, memory_lengths, ys_in, ys_in_lengths, deterministic=True):
        cfg = self.cfg
        d_model = memory.shape[-1]
        x = nn.Embed(self.vocab_size, d_model, dtype=self.dtype, name="embed")(ys_in)
        x = PositionalEncoding(cfg.positional_dropout_rate, dtype=self.dtype, name="pos_enc")(
            x, deterministic
        )
        valid = make_valid_mask(ys_in_lengths, ys_in.shape[1])
        tgt_mask = valid[:, None, :] & valid[:, :, None]  # full bidirectional
        memory_mask = make_valid_mask(memory_lengths, memory.shape[1])[:, None, :]
        for i in range(cfg.num_blocks):
            x = DecoderLayer(
                cfg.attention_heads, cfg.linear_units, cfg.dropout_rate,
                cfg.self_attention_dropout_rate, cfg.src_attention_dropout_rate,
                dtype=self.dtype, name=f"block_{i}",
            )(x, tgt_mask, memory, memory_mask, deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="after_norm")(x)
        return nn.Dense(self.vocab_size, dtype=self.dtype, name="output_layer")(x)


class MaskCTCModel(nn.Module):
    """CTC + conditional-MLM hybrid (maskctc_model.py:MaskCTCModel)."""

    cfg: ASRModelConfig
    dtype: Dtype = jnp.float32

    @property
    def mask_id(self) -> int:
        return self.cfg.vocab_size  # appended <mask> (maskctc_model.py mask_token)

    def setup(self):
        cfg = self.cfg
        from llm_guided_asr_tpu.models.conformer import make_encoder

        self.encoder = make_encoder(cfg.encoder_type, cfg.encoder, self.dtype, name="encoder")
        self.ctc_head = nn.Dense(cfg.vocab_size, dtype=self.dtype, name="ctc_head")
        self.decoder = MLMDecoder(
            cfg.vocab_size + 1, cfg.decoder, dtype=self.dtype, name="decoder"
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
        return self.encoder(feats.astype(self.dtype), feats_lengths, deterministic)

    def ctc_logits(self, encoder_out):
        return self.ctc_head(encoder_out)

    def ctc_log_softmax(self, encoder_out):
        return jax.nn.log_softmax(self.ctc_head(encoder_out).astype(jnp.float32), axis=-1)

    def mlm_logits(self, encoder_out, encoder_out_lengths, ys_masked, ys_lengths,
                   deterministic: bool = True):
        return self.decoder(encoder_out, encoder_out_lengths, ys_masked, ys_lengths, deterministic)

    def __call__(self, speech, speech_lengths, text, text_lengths, deterministic=True):
        cfg = self.cfg
        enc, enc_lens = self.encode(speech, speech_lengths, deterministic)
        stats: Dict[str, jnp.ndarray] = {}
        loss_ctc = ctc_loss(self.ctc_logits(enc), enc_lens, text, text_lengths, cfg.blank_id)
        stats["loss_ctc"] = loss_ctc

        # random masking (maskctc_model.py: uniform count of masked positions)
        valid = make_valid_mask(text_lengths, text.shape[1])
        clean = jnp.where(valid, text, 0)
        if not deterministic:
            rng = self.make_rng("mlm")
            ratio = jax.random.uniform(rng, (text.shape[0], 1))
            mask_draw = jax.random.uniform(jax.random.fold_in(rng, 1), text.shape)
            masked = (mask_draw < ratio) & valid
        else:
            masked = (jnp.arange(text.shape[1])[None, :] % 2 == 1) & valid
        # ensure at least something is masked per utterance
        ys_in = jnp.where(masked, self.mask_id, clean)
        targets = jnp.where(masked, clean, cfg.ignore_id)
        logits = self.mlm_logits(enc, enc_lens, ys_in, text_lengths, deterministic)
        loss_mlm = label_smoothing_loss(
            logits, targets, cfg.lsm_weight, cfg.ignore_id, cfg.length_normalized_loss
        )
        stats["loss_mlm"] = loss_mlm
        stats["acc"] = accuracy(logits, targets, cfg.ignore_id)
        loss = cfg.ctc_weight * loss_ctc + (1 - cfg.ctc_weight) * loss_mlm
        stats["loss"] = loss
        return loss, stats, jnp.asarray(speech.shape[0], jnp.float32)


def maskctc_decode(
    model: MaskCTCModel,
    variables: Dict,
    enc: jnp.ndarray,  # [1, T, D]
    enc_lens: jnp.ndarray,
    threshold: float = 0.999,
    n_iterations: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy CTC -> mask low-confidence -> iterative MLM refill
    (maskctc_model.py MaskCTCInference semantics).  Returns (tokens [1, U], n)."""
    logp = model.apply(variables, enc, method=model.ctc_log_softmax)
    tokens, n_tok = ctc_greedy_decode(logp, enc_lens, blank_id=model.cfg.blank_id)

    # per-token confidence: max frame posterior among frames assigned to token
    # (approximation: use the token's best frame prob via a second pass)
    probs = jnp.exp(logp)  # [1, T, V]
    frame_best = jnp.max(probs, axis=-1)  # [1, T]
    y = jnp.argmax(logp, axis=-1)
    prev = jnp.concatenate([jnp.full_like(y[:, :1], -1), y[:, :-1]], axis=1)
    frames_valid = make_valid_mask(enc_lens, y.shape[1])
    keep = (y != model.cfg.blank_id) & (y != prev) & frames_valid
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    pos = jnp.where(keep, pos, y.shape[1])
    conf = jnp.ones_like(tokens, jnp.float32)
    conf = conf.at[jnp.arange(y.shape[0])[:, None], pos].min(
        jnp.where(keep, frame_best, 1.0), mode="drop"
    )

    u = tokens.shape[1]
    tok_valid = jnp.arange(u)[None, :] < n_tok[:, None]
    masked = (conf < threshold) & tok_valid
    ys = jnp.where(masked, model.mask_id, tokens)

    for _ in range(n_iterations):
        logits = model.apply(
            variables, enc, enc_lens, ys, n_tok, method=model.mlm_logits
        )
        pred = jnp.argmax(logits[..., : model.cfg.vocab_size], axis=-1)
        pred_conf = jnp.max(
            jax.nn.softmax(logits[..., : model.cfg.vocab_size], axis=-1), axis=-1
        )
        still_masked = ys == model.mask_id
        n_masked = jnp.sum(still_masked)
        # fill the top half (at least 1) most confident masked slots
        fill_k = jnp.maximum(n_masked // 2, 1)
        score = jnp.where(still_masked, pred_conf, -1.0)
        thresh = jnp.sort(score.reshape(-1))[::-1][jnp.minimum(fill_k - 1, score.size - 1)]
        fill = still_masked & (score >= thresh)
        ys = jnp.where(fill, pred, ys)
    # final pass fills any remainder
    logits = model.apply(variables, enc, enc_lens, ys, n_tok, method=model.mlm_logits)
    pred = jnp.argmax(logits[..., : model.cfg.vocab_size], axis=-1)
    ys = jnp.where(ys == model.mask_id, pred, ys)
    return ys, n_tok


def partially_ar_decode(
    model: MaskCTCModel,
    variables: Dict,
    enc: jnp.ndarray,  # [1, T, D]
    enc_lens: jnp.ndarray,
    threshold: float = 0.999,
    beam_size: int = 5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Partially autoregressive decoding (espnet/nets/
    beam_search_partially_AR.py + espnet2/asr/partially_AR_model.py):
    greedy CTC fixes the high-confidence tokens; the low-confidence
    (masked) positions are decoded LEFT-TO-RIGHT with a beam over the MLM
    decoder, each choice conditioning later masked positions — instead of
    maskctc's order-free argmax refill.  One jitted scan over positions,
    beam and vocab axes vectorized.  Returns (tokens [1, U], n_tok)."""
    logp = model.apply(variables, enc, method=model.ctc_log_softmax)
    tokens, n_tok = ctc_greedy_decode(logp, enc_lens, blank_id=model.cfg.blank_id)

    probs = jnp.exp(logp)
    frame_best = jnp.max(probs, axis=-1)
    y = jnp.argmax(logp, axis=-1)
    prev = jnp.concatenate([jnp.full_like(y[:, :1], -1), y[:, :-1]], axis=1)
    frames_valid = make_valid_mask(enc_lens, y.shape[1])
    keep = (y != model.cfg.blank_id) & (y != prev) & frames_valid
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    pos = jnp.where(keep, pos, y.shape[1])
    conf = jnp.ones_like(tokens, jnp.float32)
    conf = conf.at[jnp.arange(y.shape[0])[:, None], pos].min(
        jnp.where(keep, frame_best, 1.0), mode="drop"
    )
    u = tokens.shape[1]
    tok_valid = jnp.arange(u)[None, :] < n_tok[:, None]
    masked0 = ((conf < threshold) & tok_valid)[0]  # [U]
    ys0 = jnp.where(masked0, model.mask_id, tokens[0])  # [U]

    K = beam_size
    V = model.cfg.vocab_size
    beam_ys = jnp.broadcast_to(ys0, (K, u))
    beam_score = jnp.where(jnp.arange(K) == 0, 0.0, -1.0e10)
    enc_k = jnp.broadcast_to(enc[0], (K,) + enc.shape[1:])
    lens_k = jnp.full((K,), n_tok[0], jnp.int32)

    def step(carry, p):
        beam_ys, beam_score = carry
        logits = model.apply(
            variables, enc_k, lens_k, beam_ys, lens_k, method=model.mlm_logits
        )[:, p, :V]  # [K, V]
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        cand = beam_score[:, None] + lp  # [K, V]
        top, idx = jax.lax.top_k(cand.reshape(-1), K)
        src, tok = idx // V, idx % V
        new_ys = beam_ys[src].at[:, p].set(tok)
        # unmasked positions: identity (keep beams and scores)
        is_masked = masked0[p]
        beam_ys = jnp.where(is_masked, new_ys, beam_ys)
        beam_score = jnp.where(is_masked, top, beam_score)
        return (beam_ys, beam_score), None

    (beam_ys, beam_score), _ = jax.lax.scan(
        step, (beam_ys, beam_score), jnp.arange(u)
    )
    best = jnp.argmax(beam_score)
    return beam_ys[best][None], n_tok
