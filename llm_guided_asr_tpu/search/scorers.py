"""Attention-decoder scorers for the on-device beam search.

The reference composes scorers through BatchScorerInterface objects with
per-hypothesis state lists (scorer_interface.py:83); here a scorer is a
static-shape triple of pure functions over a pytree state:

  init(enc, enc_len, beam, lmax) -> state
  step(enc, enc_len, state, tokens, lens, step) -> (logp [K, V], state)
  select(state, parent [K]) -> state     (beam reordering)

- StatelessAttScorer: full-prefix recompute each step (any model exposing
  ``decoder_logits``); state is empty.  Right for the standard Transformer
  decoder where L^2 recompute is cheap on the MXU.
- CachedGuidedScorer: the LLM-guided decoder with the shared-prefix KV cache
  (transformer_decoder.py:1134 forward_one_step_cached rebuild): the prompt
  KV is computed once per utterance, response KV/hidden-state buffers are
  static per-beam arrays updated in place inside the search while_loop.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp


class StatelessAttScorer:
    def __init__(self, model, variables):
        self.model = model
        self.variables = variables

    def init(self, enc, enc_len, beam, lmax, ctx=None):
        return {}

    def step(self, enc, enc_len, state, tokens, lens, step):
        k = tokens.shape[0]
        enc_k = jnp.broadcast_to(enc[0], (k,) + enc.shape[1:])
        enc_lens_k = jnp.full((k,), enc_len, jnp.int32)
        try:
            last = self.model.apply(
                self.variables, enc_k, enc_lens_k, tokens, lens,
                method=self.model.decoder_logits, only_last=True,
            )  # [K, V]: vocab projection on the last position only
        except TypeError:
            logits = self.model.apply(
                self.variables, enc_k, enc_lens_k, tokens, lens,
                method=self.model.decoder_logits,
            )
            last = logits[jnp.arange(k), lens - 1]
        return jax.nn.log_softmax(last.astype(jnp.float32), axis=-1), state

    def select(self, state, parent):
        return state


class CachedGuidedScorer:
    """LLM-guided decoder scoring with static KV buffers (one LLM token/step)."""

    # beam-reshuffle axes on select(); gd_mem_* are utterance-constant
    # (shared across the beam) and ride through untouched.  "k"/"v" are
    # TUPLES of per-layer [beam, Tc, Hkv, hd] buffers (in-place decode path).
    _GATHER_AXES = {"k": 0, "v": 0, "kv_valid": 0, "gd_xs": 1}

    def __init__(self, model, variables):
        self.model = model
        self.variables = variables
        self.bias_words = None  # [1, W] per-utterance biasing tokens
        self.bias_words_lengths = None

    def set_bias(self, bias_words, bias_words_lengths):
        """Per-utterance contextual biasing (asr_inference_new utt_id plumbing).

        NOTE: values set here are only a fallback used when no ``ctx`` reaches
        ``init``; inside a jitted search they are baked in as constants at
        trace time.  Per-utterance switching must pass ctx=(ids, lens) through
        BatchBeamSearch.__call__ so the bias is a traced argument.
        """
        self.bias_words = bias_words
        self.bias_words_lengths = bias_words_lengths

    def init(self, enc, enc_len, beam, lmax, ctx=None):
        if ctx is None and self.bias_words is not None:
            ctx = (self.bias_words, self.bias_words_lengths)
        kwargs = {}
        if ctx is not None:
            kwargs = dict(bias_words=ctx[0], bias_words_lengths=ctx[1])
        return self.model.apply(
            self.variables, enc, jnp.asarray([enc_len]), beam, lmax,
            method=self.model.decode_prefix, **kwargs,
        )

    def step(self, enc, enc_len, state, tokens, lens, step):
        k = tokens.shape[0]
        last = tokens[jnp.arange(k), lens - 1]
        return self.model.apply(
            self.variables, enc, jnp.asarray([enc_len]), state, last, step,
            method=self.model.decode_step,
        )

    def select(self, state, parent):
        out = {}
        for key, val in state.items():
            ax = self._GATHER_AXES.get(key)
            if ax is None:
                out[key] = val
            else:
                out[key] = jax.tree_util.tree_map(
                    lambda a: jnp.take(a, parent, axis=ax), val
                )
        return out
