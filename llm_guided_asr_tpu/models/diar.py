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
        self.head = nn.Dense(cfg.num_spk, dtype=self.dtype, name="head")

    def activity_logits(self, speech, speech_lengths, deterministic: bool = True):
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
        return self.head(x), flens  # [B, T, S]

    def __call__(
        self,
        speech: jnp.ndarray,
        speech_lengths: jnp.ndarray,
        spk_labels: jnp.ndarray,  # [B, T', S] frame activity (padded -1)
        spk_labels_lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        logits, flens = self.activity_logits(speech, speech_lengths, deterministic)
        t = min(logits.shape[1], spk_labels.shape[1])
        logits = logits[:, :t]
        labels = jnp.clip(spk_labels[:, :t].astype(jnp.float32), 0.0, 1.0)
        valid = make_valid_mask(jnp.minimum(flens, t), t)
        loss, _ = pit_bce(logits, labels, valid)
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
        stats = {"loss": loss, "der_frame": der}
        return loss, stats, jnp.asarray(speech.shape[0], jnp.float32)
