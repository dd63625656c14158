"""Language models: Transformer LM + sequential RNN LM + ESPnetLanguageModel.

Rebuild of espnet2/lm/ (transformer_lm.py:12, seq_rnn_lm.py,
espnet_model.py:13).  Both LMs expose ``__call__(tokens, lengths) -> logits``
for training and a full-prefix ``score`` usable as a beam-search full scorer
(the reference plugs them in through BatchScorerInterface,
asr_inference.py:184-196 — here a scorer is just a function [K, L] -> [K, V]).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.transformer import (
    PositionalEncoding,
    TransformerEncoderLayer,
)
from llm_guided_asr_tpu.ops.losses import accuracy
from llm_guided_asr_tpu.utils.masks import causal_attn_mask, make_valid_mask

Dtype = Any


@dataclasses.dataclass(frozen=True)
class TransformerLMConfig:
    vocab_size: int = 1000
    pos_enc: Optional[str] = "sinusoidal"
    embed_unit: int = 128
    att_unit: int = 256
    head: int = 2
    unit: int = 1024
    layer: int = 4
    dropout_rate: float = 0.5

    @classmethod
    def from_dict(cls, d: dict, vocab_size: int) -> "TransformerLMConfig":
        from llm_guided_asr_tpu.utils.config import filter_known_fields

        d = filter_known_fields(cls, d, "lm_conf")
        d.pop("vocab_size", None)
        return cls(vocab_size=vocab_size, **d)


class TransformerLM(nn.Module):
    """espnet2/lm/transformer_lm.py:12 — embed -> N causal encoder layers -> vocab."""

    cfg: TransformerLMConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,  # [B, L]
        lengths: jnp.ndarray,  # [B]
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        x = nn.Embed(cfg.vocab_size, cfg.embed_unit, dtype=self.dtype, name="embed")(tokens)
        # the torch Encoder's input_layer='linear' stack is Linear -> LN ->
        # Dropout -> ReLU -> pos_enc (espnet/nets/pytorch_backend/transformer/
        # encoder.py:120-127); keep all of it for checkpoint parity
        x = nn.Dense(cfg.att_unit, dtype=self.dtype, name="input_proj")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="input_norm")(x)
        x = nn.Dropout(cfg.dropout_rate)(x, deterministic=deterministic)
        x = nn.relu(x)
        x = PositionalEncoding(cfg.dropout_rate, dtype=self.dtype, name="pos_enc")(
            x, deterministic
        )
        mask = causal_attn_mask(lengths, tokens.shape[1])
        for i in range(cfg.layer):
            x = TransformerEncoderLayer(
                cfg.head, cfg.unit, cfg.dropout_rate, 0.0, dtype=self.dtype,
                name=f"block_{i}",
            )(x, mask, deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="after_norm")(x)
        return nn.Dense(cfg.vocab_size, dtype=self.dtype, name="output")(x)


@dataclasses.dataclass(frozen=True)
class SequentialRNNLMConfig:
    vocab_size: int = 1000
    unit: int = 650
    nlayers: int = 2
    rnn_type: str = "lstm"  # lstm | gru

    @classmethod
    def from_dict(cls, d: dict, vocab_size: int) -> "SequentialRNNLMConfig":
        from llm_guided_asr_tpu.utils.config import filter_known_fields

        d = filter_known_fields(cls, d, "lm_conf")
        d.pop("vocab_size", None)
        return cls(vocab_size=vocab_size, **d)


class SequentialRNNLM(nn.Module):
    """espnet2/lm/seq_rnn_lm.py — embed -> stacked LSTM/GRU -> vocab.

    Implemented as a scan over time; usable for training and full-prefix
    scoring (state carrying for incremental decode comes with the cached
    scorer work).
    """

    cfg: SequentialRNNLMConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, lengths: jnp.ndarray, deterministic: bool = True):
        cfg = self.cfg
        x = nn.Embed(cfg.vocab_size, cfg.unit, dtype=self.dtype, name="embed")(tokens)
        cell_cls = nn.OptimizedLSTMCell if cfg.rnn_type == "lstm" else nn.GRUCell
        for i in range(cfg.nlayers):
            cell = cell_cls(cfg.unit, name=f"rnn_{i}")
            rnn = nn.RNN(cell, name=f"rnn_scan_{i}")
            x = rnn(x)
        return nn.Dense(cfg.vocab_size, dtype=self.dtype, name="output")(x)


class ESPnetLanguageModel(nn.Module):
    """espnet2/lm/espnet_model.py:13 — nll over <sos> y </sos> with stats."""

    lm: nn.Module
    vocab_size: int
    ignore_id: int = 0  # espnet LM pads with 0 and ignores index 0

    def setup(self):
        pass

    def nll(
        self,
        text: jnp.ndarray,  # [B, L] padded with ignore_id
        text_lengths: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Per-example summed token NLL and token counts (lm/espnet_model.py:37)."""
        b, l = text.shape
        sos = self.vocab_size - 1
        eos = self.vocab_size - 1
        valid = make_valid_mask(text_lengths, l)
        clean = jnp.where(valid, text, 0)
        x = jnp.concatenate([jnp.full((b, 1), sos, text.dtype), clean], axis=1)
        pos = jnp.arange(l + 1)[None, :]
        t = jnp.concatenate([clean, jnp.zeros((b, 1), text.dtype)], axis=1)
        t = jnp.where(pos == text_lengths[:, None], eos, t)
        t_valid = pos <= text_lengths[:, None]
        logits = self.lm(x, text_lengths + 1, deterministic)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tok_nll = -jnp.take_along_axis(logp, jnp.maximum(t, 0)[..., None], axis=-1)[..., 0]
        tok_nll = jnp.where(t_valid, tok_nll, 0.0)
        return jnp.sum(tok_nll, axis=1), jnp.sum(t_valid, axis=1)

    def __call__(self, text, text_lengths, deterministic: bool = True):
        nll, counts = self.nll(text, text_lengths, deterministic)
        ntokens = jnp.maximum(jnp.sum(counts), 1)
        loss = jnp.sum(nll) / ntokens
        stats = {"loss": loss, "perplexity": jnp.exp(loss)}
        return loss, stats, jnp.asarray(text.shape[0], jnp.float32)


def make_lm_score_fn(lm_model, lm_variables):
    """Wrap an LM as a beam-search full scorer: (tokens [K, L], lens) -> logp [K, V]."""

    def score(tokens, lengths):
        logits = lm_model.apply(lm_variables, tokens, lengths, deterministic=True)
        k = tokens.shape[0]
        last = logits[jnp.arange(k), lengths - 1]
        return jax.nn.log_softmax(last.astype(jnp.float32), axis=-1)

    return score


def lm_rescore_nbest(
    hyps,  # List[Hypothesis] with .yseq (incl. sos/eos) and .score
    lm_model,
    lm_variables,
    weight: float = 0.5,
    sos: int = 0,
    eos: int = 0,
):
    """Neural-LM n-best rescoring (espnet2/fst/lm_rescore.py:nbest analog,
    without the k2 lattice machinery): total = beam score + weight * LM
    log-prob of the hypothesis; returns hyps re-sorted by the new total."""
    import numpy as np

    nll_fn = jax.jit(lambda t, l: lm_model.apply(lm_variables, t, l, method=lm_model.nll))
    rescored = []
    for h in hyps:
        # the LM's nll wraps with its own <sos>/<eos>; strip the search's
        ids = [i for i in h.yseq if i not in (sos, eos)]
        arr = jnp.asarray([ids or [0]], jnp.int32)
        lens = jnp.asarray([max(len(ids), 1)], jnp.int32)
        nll, ntok = nll_fn(arr, lens)
        lm_lp = -float(np.asarray(nll).sum())
        total = h.score + weight * lm_lp
        rescored.append(
            h._replace(score=total, scores={**h.scores, "lm_rescore": lm_lp})
        )
    return sorted(rescored, key=lambda h: -h.score)
