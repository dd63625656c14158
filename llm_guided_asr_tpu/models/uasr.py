"""Unsupervised ASR (wav2vec-U style GAN, espnet2/uasr/ rebuild).

Generator maps (SSL/log-mel) feature segments to phoneme distributions;
a conv discriminator judges phoneme sequences real (unpaired text) vs fake
(generator output).  Criteria follow uasr/loss/: discriminator BCE,
generator adversarial + gradient-penalty-free smoothness + phoneme diversity.
Trains with train/gan_trainer.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


@dataclasses.dataclass(frozen=True)
class UASRConfig:
    n_phones: int = 40
    feat_dim: int = 80
    hidden: int = 128
    kernel: int = 4
    stride: int = 2  # segment pooling


class UASRGenerator(nn.Module):
    cfg: UASRConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray, feats_lengths: jnp.ndarray):
        """[B, T, F] -> (phone logits [B, T', P], lengths)."""
        cfg = self.cfg
        h = nn.Conv(cfg.hidden, (cfg.kernel,), strides=(cfg.stride,),
                    padding="SAME", dtype=self.dtype, name="conv")(feats)
        h = jax.nn.gelu(h)
        logits = nn.Dense(cfg.n_phones, dtype=self.dtype, name="proj")(h)
        out_lens = (feats_lengths + cfg.stride - 1) // cfg.stride
        return logits, out_lens


class UASRDiscriminator(nn.Module):
    cfg: UASRConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, phone_probs: jnp.ndarray, lengths: jnp.ndarray):
        """[B, T, P] distributions -> [B] realness scores."""
        h = nn.Conv(self.cfg.hidden, (5,), padding="SAME", dtype=self.dtype,
                    name="conv1")(phone_probs)
        h = jax.nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.cfg.hidden, (5,), padding="SAME", dtype=self.dtype,
                    name="conv2")(h)
        h = jax.nn.leaky_relu(h, 0.2)
        valid = make_valid_mask(lengths, h.shape[1])[..., None]
        pooled = jnp.sum(jnp.where(valid, h, 0.0), 1) / jnp.maximum(
            lengths[:, None].astype(h.dtype), 1
        )
        return nn.Dense(1, dtype=self.dtype, name="out")(pooled)[..., 0]


def uasr_g_losses(logits, lengths, d_scores) -> Dict[str, jnp.ndarray]:
    """Generator criteria (uasr/loss): adversarial + smoothness + diversity."""
    probs = jax.nn.softmax(logits, axis=-1)
    valid = make_valid_mask(lengths, logits.shape[1])
    # adversarial (non-saturating): want D(fake) high
    z = jnp.clip(d_scores, -30, 30)
    adv = jnp.mean(jnp.log1p(jnp.exp(-z)))
    # smoothness: penalize frame-to-frame distribution jumps
    diff = jnp.sum((probs[:, 1:] - probs[:, :-1]) ** 2, -1)
    smooth = jnp.sum(jnp.where(valid[:, 1:], diff, 0.0)) / jnp.maximum(
        jnp.sum(valid[:, 1:]), 1
    )
    # phoneme diversity: maximize batch-level entropy of the mean distribution
    mean_p = jnp.sum(jnp.where(valid[..., None], probs, 0.0), (0, 1)) / jnp.maximum(
        jnp.sum(valid), 1
    )
    diversity = jnp.sum(mean_p * jnp.log(mean_p + 1e-8))  # negative entropy
    return {"adv": adv, "smooth": smooth, "diversity": diversity}


def uasr_d_loss(real_scores, fake_scores) -> jnp.ndarray:
    zr = jnp.clip(real_scores, -30, 30)
    zf = jnp.clip(fake_scores, -30, 30)
    return jnp.mean(jnp.log1p(jnp.exp(-zr))) + jnp.mean(jnp.log1p(jnp.exp(zf)))
