"""Speech language model over discrete audio units (espnet2/speechlm/ lite).

The reference speechlm trains LMs over tokenized speech (codec codes / SSL
units) for generation and multitask conditioning.  This minimal-but-real
composition: models/codec.py (or hubert k-means) tokenizes audio into unit
sequences; a TransformerLM (models/lm.py) models them autoregressively;
generation samples unit continuations that codec.decode_codes renders back
to audio.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from llm_guided_asr_tpu.models.lm import TransformerLM, TransformerLMConfig


@dataclasses.dataclass(frozen=True)
class SpeechLMConfig:
    unit_vocab_size: int = 256  # codec codebook size (single-quantizer stream)
    lm: TransformerLMConfig = None

    def resolve_lm(self) -> TransformerLMConfig:
        if self.lm is not None:
            return self.lm
        return TransformerLMConfig(vocab_size=self.unit_vocab_size + 1)


class SpeechLM:
    """Host-side composition wrapper: tokenizer (codec) + unit LM."""

    def __init__(self, codec_model=None, codec_variables=None, quantizer: int = 0):
        self.codec = codec_model
        self.codec_vars = codec_variables
        self.quantizer = quantizer

    def tokenize(self, speech: jnp.ndarray) -> jnp.ndarray:
        """[B, N] audio -> [B, T] unit ids (first RVQ stream)."""
        codes = self.codec.apply(self.codec_vars, speech, method=self.codec.encode)
        return codes[..., self.quantizer]

    @staticmethod
    def lm_loss_fn(lm: TransformerLM, variables, units: jnp.ndarray,
                   unit_lengths: jnp.ndarray, sos: int):
        """Next-unit CE (lm/espnet_model.py nll over the unit stream)."""
        b, t = units.shape
        x = jnp.concatenate([jnp.full((b, 1), sos, units.dtype), units[:, :-1]], 1)
        logits = lm.apply(variables, x, unit_lengths, deterministic=True)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        valid = jnp.arange(t)[None, :] < unit_lengths[:, None]
        nll = -jnp.take_along_axis(logp, jnp.maximum(units, 0)[..., None], -1)[..., 0]
        loss = jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(jnp.sum(valid), 1)
        acc = jnp.sum(
            jnp.where(valid, jnp.argmax(logits, -1) == units, False)
        ) / jnp.maximum(jnp.sum(valid), 1)
        return loss, acc

    @staticmethod
    def generate(lm: TransformerLM, variables, prompt: jnp.ndarray, n_new: int,
                 sos: int, greedy: bool = True, key=None):
        """Continue a unit sequence autoregressively (greedy or sampled)."""
        units = prompt
        for i in range(n_new):
            b, t = units.shape
            x = jnp.concatenate([jnp.full((b, 1), sos, units.dtype), units], 1)
            logits = lm.apply(variables, x, jnp.full((b,), t + 1), deterministic=True)
            nxt_logits = logits[:, t]
            if greedy:
                nxt = jnp.argmax(nxt_logits, -1)
            else:
                key, sub = jax.random.split(key)
                nxt = jax.random.categorical(sub, nxt_logits)
            units = jnp.concatenate([units, nxt[:, None].astype(units.dtype)], 1)
        return units[:, prompt.shape[1]:]


class SpeechLMModel(nn.Module):
    """Trainer-contract wrapper: next-unit LM over precomputed codec units.

    Makes the speechlm domain trainable through the generic task CLI
    (espnet2/tasks/speechlm.py analog): __call__(units, units_lengths) ->
    (loss, stats, weight). Units come from a codec tokenizer offline (or
    SpeechLM.tokenize); the sos id is unit_vocab_size (one extra row).
    """

    cfg: SpeechLMConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.lm = TransformerLM(self.cfg.resolve_lm(), dtype=self.dtype, name="lm")

    def __call__(self, units, units_lengths, deterministic: bool = True):
        b, t = units.shape
        sos = self.cfg.unit_vocab_size
        units = jnp.maximum(units, 0)  # -1 pads -> 0 (masked by lengths)
        x = jnp.concatenate([jnp.full((b, 1), sos, units.dtype), units[:, :-1]], 1)
        logits = self.lm(x, units_lengths, deterministic)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        valid = jnp.arange(t)[None, :] < units_lengths[:, None]
        nll = -jnp.take_along_axis(logp, units[..., None], -1)[..., 0]
        n = jnp.maximum(jnp.sum(valid), 1)
        loss = jnp.sum(jnp.where(valid, nll, 0.0)) / n
        acc = jnp.sum(jnp.where(valid, jnp.argmax(logits, -1) == units, False)) / n
        return loss, {"loss": loss, "acc": acc, "ppl": jnp.exp(loss)}, jnp.asarray(
            b, jnp.float32
        )
