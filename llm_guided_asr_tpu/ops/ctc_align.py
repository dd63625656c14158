"""CTC forced alignment (Viterbi over the CTC graph).

Rebuild of the reference's alignment tooling (espnet2/bin/asr_align.py via
the ctc_segmentation package): given CTC log-posteriors and a known
transcript, find the best frame-level alignment through the standard CTC
state graph (blank-interleaved: 2U+1 states), returning per-token start/end
frames.  Forward pass is a lax.scan over frames with the state axis
vectorized; backtrace follows stored argmax decisions.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1.0e30


def ctc_forced_align(
    logp: jnp.ndarray,  # [T, V] CTC log-softmax
    tokens: jnp.ndarray,  # [U] transcript token ids (no blanks)
    t_len: jnp.ndarray,  # scalar valid frames
    blank_id: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (state_per_frame [T] in 0..2U, token_per_frame [T], -1=blank)."""
    t_max, v = logp.shape
    u = tokens.shape[0]
    s = 2 * u + 1  # blank, tok0, blank, tok1, ..., blank
    state_tok = jnp.stack(
        [jnp.full((u,), blank_id, tokens.dtype), tokens], axis=1
    ).reshape(-1)
    state_tok = jnp.concatenate([state_tok, jnp.full((1,), blank_id, tokens.dtype)])
    # emission logp per state per frame
    emit = logp[:, state_tok]  # [T, S]

    is_tok = jnp.arange(s) % 2 == 1
    # skip transition s-2 -> s allowed for token states with different token
    prev_tok = jnp.concatenate([jnp.full((2,), -1, tokens.dtype), state_tok[:-2]])
    can_skip = is_tok & (state_tok != prev_tok)

    def step(alpha, inp):
        e_t, valid_t = inp
        stay = alpha
        diag = jnp.concatenate([jnp.full((1,), NEG_INF), alpha[:-1]])
        skip = jnp.where(
            can_skip, jnp.concatenate([jnp.full((2,), NEG_INF), alpha[:-2]]), NEG_INF
        )
        choices = jnp.stack([stay, diag, skip])  # [3, S]
        best = jnp.max(choices, axis=0)
        came = jnp.argmax(choices, axis=0)
        # freeze beyond the valid frames (came=stay)
        new_alpha = jnp.where(valid_t, best + e_t, alpha)
        came = jnp.where(valid_t, came, 0)
        return new_alpha, came

    alpha0 = jnp.full((s,), NEG_INF).at[0].set(emit[0, 0])
    if u > 0:
        alpha0 = alpha0.at[1].set(emit[0, 1])
    frame_valid = jnp.arange(1, t_max) < t_len
    alpha, came = jax.lax.scan(step, alpha0, (emit[1:], frame_valid))  # came: [T-1, S]

    # final state: last blank or last token at frame t_len-1; others invalid
    # (mask frames beyond t_len by forcing 'stay' — handled in backtrace)
    end_state = jnp.where(alpha[s - 1] >= alpha[s - 2], s - 1, s - 2) if u > 0 else 0

    def bwd(state, inp):
        came_t, t = inp
        # frames at or beyond t_len: stay
        move = jnp.where(t < t_len, came_t[state], 0)
        prev = state - move
        return prev, state

    ts = jnp.arange(1, t_max)
    first_state, states = jax.lax.scan(
        bwd, jnp.asarray(end_state), (came, ts), reverse=True
    )
    state_seq = jnp.concatenate([first_state[None], states])  # [T]
    tok_idx = jnp.where(state_seq % 2 == 1, state_seq // 2, -1)
    valid = jnp.arange(t_max) < t_len
    return jnp.where(valid, state_seq, -1), jnp.where(valid, tok_idx, -1)


def token_boundaries(
    token_per_frame: np.ndarray, n_tokens: int
) -> np.ndarray:
    """[T] token index per frame (-1 = blank) -> [U, 2] (start, end) frames."""
    token_per_frame = np.asarray(token_per_frame)
    bounds = np.zeros((n_tokens, 2), np.int64)
    for u in range(n_tokens):
        frames = np.nonzero(token_per_frame == u)[0]
        if len(frames):
            bounds[u] = [frames[0], frames[-1] + 1]
        elif u > 0:
            bounds[u] = bounds[u - 1][[1, 1]]
    return bounds
