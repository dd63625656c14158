"""On-device greedy CTC decoding.

The reference does this host-side with torch.unique_consecutive
(transformer_decoder.py:1021-1039); here the collapse + blank removal +
left-compaction is a fully vectorized scatter so it can run inside jit (it is
also the first-pass hypothesis generator for the LLM-guided decoder, which
must stay on-chip).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.utils.masks import make_valid_mask


def ctc_greedy_decode(
    logits: jnp.ndarray,  # [B, T, V] (pre- or post-softmax; argmax invariant)
    lengths: jnp.ndarray,  # [B]
    blank_id: int = 0,
    pad_id: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """argmax -> collapse repeats -> drop blanks -> left-compact.

    Returns (tokens [B, T] left-aligned padded with ``pad_id``, n_tokens [B]).
    """
    y = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, T]
    valid = make_valid_mask(lengths, y.shape[1])
    y = jnp.where(valid, y, blank_id)
    prev = jnp.concatenate([jnp.full_like(y[:, :1], -1), y[:, :-1]], axis=1)
    keep = (y != blank_id) & (y != prev) & valid
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1  # target slot per kept tok
    n_tokens = jnp.sum(keep.astype(jnp.int32), axis=1)
    pos = jnp.where(keep, pos, y.shape[1])  # dropped -> out-of-range (scatter drop)
    out = jnp.full_like(y, pad_id)
    b_idx = jnp.arange(y.shape[0])[:, None]
    out = out.at[b_idx, pos].set(y, mode="drop")
    return out, n_tokens
