"""Speaker diarization: EEND-style end-to-end model (espnet2/diar/ rebuild).

Mirrors espnet2/diar/espnet_model.py: log-mel frontend -> transformer
encoder -> per-frame per-speaker sigmoid activity, trained with
permutation-invariant binary cross-entropy (attractor-free EEND).
Diarization error rate (frame-level) is reported as the validation metric.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.conformer import ConformerConfig
from llm_guided_asr_tpu.models.transformer import PositionalEncoding, TransformerEncoderLayer
from llm_guided_asr_tpu.ops.frontend import FrontendConfig, default_frontend, utterance_mvn
from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


@dataclasses.dataclass(frozen=True)
class DiarConfig:
    num_spk: int = 2
    frontend: FrontendConfig = FrontendConfig(n_fft=512, hop_length=128, n_mels=23)
    adim: int = 128
    heads: int = 2
    units: int = 256
    layers: int = 2
    # EEND-EDA (diar/attractor/rnn_attractor.py): LSTM encoder-decoder
    # attractors; activity = encoder_out . attractor, plus an existence head
    # trained to [1,...,1,0] so unknown speaker counts can be inferred.
    use_attractor: bool = False
    attractor_unit: int = 128
    attractor_weight: float = 1.0
    diar_weight: float = 1.0


def pit_bce(
    logits: jnp.ndarray,  # [B, T, S]
    labels: jnp.ndarray,  # [B, T, S] 0/1 activity
    valid: jnp.ndarray,  # [B, T]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Permutation-invariant frame BCE (diar/espnet_model.py pit_loss)."""
    s = logits.shape[-1]
    denom = jnp.maximum(jnp.sum(valid), 1) * s

    def bce(perm):
        lp = logits[..., list(perm)]
        z = jnp.clip(lp, -30, 30)
        per = jnp.maximum(z, 0) - z * labels + jnp.log1p(jnp.exp(-jnp.abs(z)))
        return jnp.sum(jnp.where(valid[..., None], per, 0.0), axis=(1, 2))  # [B]

    perms = list(itertools.permutations(range(s)))
    losses = jnp.stack([bce(p) for p in perms], axis=0)  # [P, B]
    best = jnp.min(losses, axis=0)
    return jnp.sum(best) / denom, jnp.argmin(losses, axis=0)


class RnnAttractor(nn.Module):
    """Encoder-decoder attractor (diar/attractor/rnn_attractor.py): an LSTM
    encodes the (order-shuffled) frame sequence into its final state; a
    second LSTM, initialized from that state and fed ``num_attr`` zero
    inputs, emits one attractor per step plus an existence logit."""

    unit: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, enc: jnp.ndarray, lens: jnp.ndarray, num_attr: int):
        """[B, T, F], [B] -> (attractors [B, num_attr, F], exist logits
        [B, num_attr])."""
        b, _, f = enc.shape
        carry = nn.RNN(nn.OptimizedLSTMCell(self.unit), return_carry=True,
                       name="enc_lstm")(enc, seq_lengths=lens)[0]
        dec_in = jnp.zeros((b, num_attr, f), enc.dtype)
        out = nn.RNN(nn.OptimizedLSTMCell(self.unit), name="dec_lstm")(
            dec_in, initial_carry=carry)
        attractors = nn.Dense(f, dtype=self.dtype, name="attr_proj")(out)
        exist = nn.Dense(1, dtype=self.dtype, name="exist")(out)[..., 0]
        return attractors, exist


class DiarizationModel(nn.Module):
    cfg: DiarConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.proj = nn.Dense(cfg.adim, dtype=self.dtype, name="proj")
        self.pos = PositionalEncoding(0.1, dtype=self.dtype, name="pos")
        self.blocks = [
            TransformerEncoderLayer(cfg.heads, cfg.units, 0.1, dtype=self.dtype,
                                    name=f"block_{i}")
            for i in range(cfg.layers)
        ]
        if cfg.use_attractor:
            self.attractor = RnnAttractor(cfg.attractor_unit, dtype=self.dtype,
                                          name="attractor")
        else:
            self.head = nn.Dense(cfg.num_spk, dtype=self.dtype, name="head")

    def encode_frames(self, speech, speech_lengths, deterministic: bool = True):
        f = self.cfg.frontend
        feats, flens = default_frontend(
            speech, speech_lengths, fs=f.fs, n_fft=f.n_fft, hop_length=f.hop_length,
            n_mels=f.n_mels,
        )
        feats = utterance_mvn(feats, flens)
        x = self.proj(feats.astype(self.dtype))
        x = self.pos(x, deterministic)
        valid = make_valid_mask(flens, x.shape[1])
        for blk in self.blocks:
            x = blk(x, valid[:, None, :], deterministic)
        return x, flens

    def activity_logits(self, speech, speech_lengths, deterministic: bool = True,
                        num_attr: Optional[int] = None):
        """[B, T, S] activity logits (+ existence logits under EDA)."""
        x, flens = self.encode_frames(speech, speech_lengths, deterministic)
        if not self.cfg.use_attractor:
            return self.head(x), flens  # [B, T, S]
        if num_attr is None:
            num_attr = self.cfg.num_spk + 1
        enc_in = x
        if not deterministic:
            # shuffle the chronological order of the VALID frames before the
            # attractor encoder (diar/espnet_model.py:112-118) — a
            # regularizer so the attractor state is order-free; padded frames
            # sort to the back and stay outside seq_lengths
            valid = make_valid_mask(flens, x.shape[1])
            r = jax.random.uniform(self.make_rng("dropout"), x.shape[:2])
            idx = jnp.argsort(jnp.where(valid, r, 2.0), axis=1)
            enc_in = jnp.take_along_axis(x, idx[..., None], axis=1)
        attractors, exist = self.attractor(enc_in, flens, num_attr)
        # activity for the first num_attr-1 attractors (last = stop token)
        pred = jnp.einsum("btf,bsf->bts", x, attractors[:, :-1])
        return (pred, exist), flens

    def __call__(
        self,
        speech: jnp.ndarray,
        speech_lengths: jnp.ndarray,
        spk_labels: jnp.ndarray,  # [B, T', S] frame activity (padded -1)
        spk_labels_lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        out, flens = self.activity_logits(speech, speech_lengths, deterministic)
        exist = None
        if self.cfg.use_attractor:
            logits, exist = out
        else:
            logits = out
        t = min(logits.shape[1], spk_labels.shape[1])
        logits = logits[:, :t]
        labels = jnp.clip(spk_labels[:, :t].astype(jnp.float32), 0.0, 1.0)
        valid = make_valid_mask(jnp.minimum(flens, t), t)
        loss, _ = pit_bce(logits, labels, valid)
        stats_extra = {}
        if exist is not None:
            # attractor existence BCE vs [1,...,1,0]
            # (diar/espnet_model.py attractor_loss)
            att_label = jnp.concatenate(
                [jnp.ones(exist.shape[1] - 1), jnp.zeros(1)])[None, :]
            z = jnp.clip(exist, -30, 30)
            att_bce = jnp.mean(
                jnp.maximum(z, 0) - z * att_label + jnp.log1p(jnp.exp(-jnp.abs(z))))
            loss = self.cfg.diar_weight * loss + self.cfg.attractor_weight * att_bce
            stats_extra["loss_att"] = att_bce
        # frame diarization error under the best permutation (approx: report
        # the min over permutations of mis-set frames)
        pred = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
        errs = []
        import itertools as it

        for p in it.permutations(range(self.cfg.num_spk)):
            e = jnp.sum(
                jnp.where(valid[..., None], jnp.abs(pred[..., list(p)] - labels), 0.0)
            )
            errs.append(e)
        der = jnp.min(jnp.stack(errs)) / jnp.maximum(jnp.sum(valid) * self.cfg.num_spk, 1)
        stats = {"loss": loss, "der_frame": der, **stats_extra}
        return loss, stats, jnp.asarray(speech.shape[0], jnp.float32)

    def estimate_activity(self, speech, speech_lengths, max_spk: int = 8,
                          threshold: float = 0.5):
        """EDA inference with unknown speaker count: decode ``max_spk + 1``
        attractors, keep those whose existence prob exceeds ``threshold``
        (the reference stops at the first below-threshold attractor).

        Returns (activity probs [B, T, max_spk], spk_count [B], flens)."""
        if not self.cfg.use_attractor:
            logits, flens = self.activity_logits(speech, speech_lengths, True)
            probs = jax.nn.sigmoid(logits)
            k = jnp.full((speech.shape[0],), self.cfg.num_spk, jnp.int32)
            return probs, k, flens
        (pred, exist), flens = self.activity_logits(
            speech, speech_lengths, True, num_attr=max_spk + 1)
        p_exist = jax.nn.sigmoid(exist)[:, :max_spk]  # [B, max_spk]
        # first index below threshold = speaker count
        below = p_exist < threshold
        k = jnp.where(below.any(axis=1),
                      jnp.argmax(below, axis=1),
                      max_spk).astype(jnp.int32)
        keep = jnp.arange(max_spk)[None, :] < k[:, None]
        probs = jax.nn.sigmoid(pred) * keep[:, None, :]
        return probs, k, flens
