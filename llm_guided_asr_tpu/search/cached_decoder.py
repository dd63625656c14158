"""KV-cached scoring for the standard TransformerDecoder.

The stateless scorer recomputes the full O(L^2) decoder per beam step; this
is the batch_score-with-cache path (transformer_decoder.py:258 forward_one_step
with per-layer caches) rebuilt TPU-style: static per-beam KV buffers updated
in place, memory (cross-attention) K/V computed once per utterance.

Implemented as *pure jnp functions over the decoder's parameter subtree* (the
same pytree the flax module trains), so cached and full-recompute paths share
weights by construction.  Layer/parameter names follow
models/transformer_decoder.py: block_i/{norm1,norm2,norm3,self_attn,src_attn,
feed_forward}, embed, pos_enc-free tables, after_norm, output_layer.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llm_guided_asr_tpu.models.transformer import sinusoidal_pos_enc


def _ln(p, x, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _dense(p, x):
    return x @ p["kernel"] + p.get("bias", 0.0)


def _heads(x, h):
    return x.reshape(*x.shape[:-1], h, x.shape[-1] // h)


class CachedDecoderScorer:
    """init/step/select scorer with per-layer self-attn KV buffers."""

    def __init__(self, model, variables, num_heads: int, num_blocks: int):
        self.model = model
        self.params = variables["params"]["decoder"]
        self.h = num_heads
        self.n_blocks = num_blocks

    # -- scorer protocol -------------------------------------------------
    def init(self, enc, enc_len, beam, lmax, ctx=None):
        """Precompute memory K/V per layer; allocate self-attn buffers."""
        p = self.params
        d_model = enc.shape[-1]
        memory = enc[0]  # [T, D] — shared across the beam, no replication
        mem_k, mem_v = [], []
        for i in range(self.n_blocks):
            blk = p[f"block_{i}"]["src_attn"]
            mem_k.append(_heads(_dense(blk["linear_k"], memory), self.h))
            mem_v.append(_heads(_dense(blk["linear_v"], memory), self.h))
        dk = d_model // self.h
        return {
            "mem_k": jnp.stack(mem_k),  # [L, T, H, dk]
            "mem_v": jnp.stack(mem_v),
            "self_k": jnp.zeros((self.n_blocks, beam, lmax, self.h, dk)),
            "self_v": jnp.zeros((self.n_blocks, beam, lmax, self.h, dk)),
            "mem_valid": (jnp.arange(enc.shape[1]) < enc_len)[None, :],  # [1, T]
        }

    def step(self, enc, enc_len, state, tokens, lens, step):
        p = self.params
        k_beam = tokens.shape[0]
        d_model = state["mem_k"].shape[-1] * self.h
        h, dk = self.h, d_model // self.h
        lmax = state["self_k"].shape[2]

        last = tokens[jnp.arange(k_beam), lens - 1]  # current token ids
        pos = lens - 1  # its position
        emb = p["embed"]["embedding"][last] * math.sqrt(d_model)
        pe = jnp.asarray(sinusoidal_pos_enc(lmax, d_model))
        x = emb + pe[pos]  # [K, D]

        self_k, self_v = state["self_k"], state["self_v"]
        kv_mask = jnp.arange(lmax)[None, :] <= pos[:, None]  # [K, Lmax]
        mem_mask = state["mem_valid"]  # [1, T]

        for i in range(self.n_blocks):
            blk = p[f"block_{i}"]
            # self-attention: q from new token; k/v appended to the buffer
            hq = _ln(blk["norm1"], x)
            q = _heads(_dense(blk["self_attn"]["linear_q"], hq), h)  # [K, H, dk]
            k_new = _heads(_dense(blk["self_attn"]["linear_k"], hq), h)
            v_new = _heads(_dense(blk["self_attn"]["linear_v"], hq), h)
            # in-place per-beam scatter at each beam's position
            self_k = self_k.at[i, jnp.arange(k_beam), pos].set(k_new)
            self_v = self_v.at[i, jnp.arange(k_beam), pos].set(v_new)
            scores = jnp.einsum("khd,klhd->khl", q, self_k[i]) / math.sqrt(dk)
            scores = jnp.where(kv_mask[:, None, :], scores, -1e9)
            attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(scores.dtype)
            o = jnp.einsum("khl,klhd->khd", attn, self_v[i]).reshape(k_beam, d_model)
            x = x + _dense(blk["self_attn"]["linear_out"], o)

            # cross-attention over precomputed memory K/V (shared per beam)
            hq = _ln(blk["norm2"], x)
            q = _heads(_dense(blk["src_attn"]["linear_q"], hq), h)
            scores = jnp.einsum("khd,thd->kht", q, state["mem_k"][i]) / math.sqrt(dk)
            scores = jnp.where(mem_mask[:, None, :], scores, -1e9)
            attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(scores.dtype)
            o = jnp.einsum("kht,thd->khd", attn, state["mem_v"][i]).reshape(k_beam, d_model)
            x = x + _dense(blk["src_attn"]["linear_out"], o)

            # feed-forward
            hf = _ln(blk["norm3"], x)
            hf = jax.nn.relu(_dense(blk["feed_forward"]["w_1"], hf))
            x = x + _dense(blk["feed_forward"]["w_2"], hf)

        x = _ln(p["after_norm"], x)
        logits = _dense(p["output_layer"], x)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        new_state = {**state, "self_k": self_k, "self_v": self_v}
        return logp, new_state

    def select(self, state, parent):
        return {
            **state,
            "self_k": jnp.take(state["self_k"], parent, axis=1),
            "self_v": jnp.take(state["self_v"], parent, axis=1),
        }
