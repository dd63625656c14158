"""Monotonic alignment search (VITS MAS) as a vectorized JAX DP.

TPU-native equivalent of the reference's Cython kernel
(espnet2/gan_tts/vits/monotonic_align/core.pyx, built in-place per
monotonic_align/__init__.py:22): the Viterbi search over monotonic
text-to-frame alignments

  Q[j, t] = value[j, t] + max(Q[j, t-1], Q[j-1, t-1])

maximized from (0, 0) to (L-1, T-1), followed by a backtrace yielding a 0/1
alignment map.  Both passes are ``lax.scan`` over the frame axis with the
token axis vectorized; batch via ``vmap``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e9


def _mas_single(value: jnp.ndarray, t_text: jnp.ndarray, t_mel: jnp.ndarray) -> jnp.ndarray:
    """value: [L, T] log-likelihoods -> [L, T] binary alignment path."""
    l_max, t_max = value.shape
    j_idx = jnp.arange(l_max)

    value = jnp.where(
        (j_idx[:, None] < t_text) & (jnp.arange(t_max)[None, :] < t_mel),
        value,
        NEG_INF,
    )

    def fwd(q_prev, v_t):
        # q[j] = v[j] + max(q_prev[j], q_prev[j-1])
        shifted = jnp.concatenate([jnp.full((1,), NEG_INF), q_prev[:-1]])
        stay = q_prev
        from_prev = shifted
        best = jnp.maximum(stay, from_prev)
        came_diag = from_prev > stay  # True: token advanced at this frame
        return v_t + best, came_diag

    q0 = jnp.where(j_idx == 0, value[:, 0], NEG_INF)
    q_final, came = jax.lax.scan(fwd, q0, jnp.moveaxis(value[:, 1:], 1, 0))
    # came: [T-1, L]

    # backtrace from (t_text-1, t_mel-1)
    j_last = jnp.clip(t_text - 1, 0, l_max - 1)

    def bwd(j, came_t):
        advanced = came_t[j]
        j_prev = jnp.where(advanced, j - 1, j)
        return jnp.maximum(j_prev, 0), j

    j_first, path_js = jax.lax.scan(bwd, j_last, came, reverse=True)
    # path_js[t-1] = token index at frame t (for t = 1..T-1); frame 0 -> j_first
    js = jnp.concatenate([j_first[None], path_js])  # [T]
    path = jax.nn.one_hot(js, l_max, dtype=jnp.float32).T  # [L, T]
    valid = (jnp.arange(t_max)[None, :] < t_mel) & (j_idx[:, None] < t_text)
    return jnp.where(valid, path, 0.0)


def monotonic_align(
    value: jnp.ndarray,  # [B, L, T] pairwise log-likelihoods
    text_lengths: jnp.ndarray,  # [B]
    mel_lengths: jnp.ndarray,  # [B]
) -> jnp.ndarray:
    """Batched MAS -> [B, L, T] binary alignment (VITS maximum_path analog)."""
    return jax.vmap(_mas_single)(value, text_lengths, mel_lengths)
