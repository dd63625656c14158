"""Vectorized CTC prefix scoring as a jitted lax.scan.

Rebuild of espnet/nets/ctc_prefix_score.py:10 (CTCPrefixScoreTH) — the
(T x 2 x beam x window) DP that, given a hypothesis prefix g and candidate
tokens c, computes the CTC *prefix* log-probability psi(g.c) = log P(g.c ...).

Notation (Watanabe et al. hybrid CTC/attention):
  r_nb[t](h): log P(paths of t frames collapsing to h, last frame emits last(h))
  r_b[t](h):  log P(paths of t frames collapsing to h, last frame blank)
  phi[t] = logaddexp(r_b[t](g), r_nb[t](g))  (or just r_b if c == last(g))
  r_nb[t](g.c) = logaddexp(r_nb[t-1](g.c), phi[t-1]) + x[t, c]
  r_b[t](g.c)  = logaddexp(r_b[t-1](g.c), r_nb[t-1](g.c)) + x[t, blank]
  psi(g.c) = r_nb[0](g.c) (+) logaddexp over t of phi[t-1] + x[t, c]
For c == eos the score is the *complete* sequence probability
logaddexp(r_nb[T-1](g), r_b[T-1](g)) (scorers/ctc.py CTCPrefixScorer.score).

Everything is batched over (beam K, candidate window W) so a decode step is
one scan of T fused VPU steps — no per-hypothesis host loop.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e10


class CTCPrefixState(NamedTuple):
    """Per-beam DP state carried across decode steps."""

    r: jnp.ndarray  # [K, T, 2] (r_nb, r_b) of each hyp's prefix
    psi: jnp.ndarray  # [K] prefix score of each hyp
    last: jnp.ndarray  # [K] last token id of each hyp
    empty: jnp.ndarray  # [K] bool: prefix is empty (sos only)


def ctc_prefix_init(logp: jnp.ndarray, length: jnp.ndarray, beam: int, blank_id: int = 0) -> CTCPrefixState:
    """Initial state for the empty prefix, replicated over the beam.

    logp: [T, V] CTC log-softmax of one utterance; length: valid frames.
    """
    t_max = logp.shape[0]
    xb = logp[:, blank_id]  # [T]
    tpos = jnp.arange(t_max)
    valid = tpos < length
    r_b = jnp.cumsum(jnp.where(valid, xb, 0.0))  # log P(all blank up to t)
    r_b = jnp.where(valid, r_b, NEG_INF)
    r_nb = jnp.full((t_max,), NEG_INF)
    r = jnp.stack([r_nb, r_b], axis=-1)  # [T, 2]
    return CTCPrefixState(
        r=jnp.broadcast_to(r, (beam,) + r.shape),
        psi=jnp.zeros((beam,)),
        last=jnp.full((beam,), -1, jnp.int32),
        empty=jnp.ones((beam,), bool),
    )


def ctc_prefix_scores(
    logp: jnp.ndarray,  # [T, V]
    length: jnp.ndarray,  # scalar valid frames
    state: CTCPrefixState,  # beam K
    cand: jnp.ndarray,  # [K, W] candidate token ids
    blank_id: int = 0,
    eos_id: int = -1,
    use_associative_scan: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Score all (hyp, candidate) extensions.

    Returns (psi [K, W] prefix scores of g.c, r_new [K, W, T, 2] their DP rows).
    The *local* step score is psi - state.psi[:, None]; for c == eos the
    returned psi is the complete-sequence probability of g itself.
    """
    t_max, v = logp.shape
    k, w = cand.shape
    tpos = jnp.arange(t_max)
    valid = tpos < length  # [T]

    x = jnp.take_along_axis(
        jnp.broadcast_to(logp[None], (k, t_max, v)), cand[:, None, :], axis=2
    )  # [K, T, W]
    x = jnp.where(valid[None, :, None], x, NEG_INF)
    xb = jnp.where(valid, logp[:, blank_id], NEG_INF)  # [T]

    r_prev_nb = state.r[..., 0]  # [K, T]
    r_prev_b = state.r[..., 1]
    r_prev_sum = jnp.logaddexp(r_prev_nb, r_prev_b)  # [K, T]
    same_as_last = cand == state.last[:, None]  # [K, W]
    # phi[t]: what g contributes when appending c at t+1
    phi = jnp.where(
        same_as_last[:, None, :], r_prev_b[:, :, None], r_prev_sum[:, :, None]
    )  # [K, T, W]

    # t = 0 init
    r_nb_0 = jnp.where(state.empty[:, None], x[:, 0, :], NEG_INF)  # [K, W]
    r_b_0 = jnp.full((k, w), NEG_INF)
    psi_0 = r_nb_0

    if use_associative_scan:
        # Both recurrences are first-order linear in the (logaddexp, +)
        # semiring — r[t] = logaddexp(r[t-1] + a[t], b[t]) — so the T-step
        # sequential chain becomes a log(T)-depth associative scan (the DP is
        # latency-bound on TPU, so this is the decode-step hot-path win).
        def compose(f1, f2):
            a1, b1 = f1
            a2, b2 = f2
            return (a1 + a2, jnp.logaddexp(b1 + a2, b2))

        # r_nb[t] = logaddexp(r_nb[t-1], phi[t-1]) + x[t]
        #        -> a[t] = x[t],  b[t] = phi[t-1] + x[t]          (t = 1..T-1)
        a_nb = jnp.moveaxis(x[:, 1:, :], 1, 0)  # [T-1, K, W]
        b_nb = jnp.moveaxis(phi[:, :-1, :] + x[:, 1:, :], 1, 0)
        ca, cb = jax.lax.associative_scan(compose, (a_nb, b_nb), axis=0)
        r_nb_seq = jnp.logaddexp(r_nb_0[None] + ca, cb)  # [T-1, K, W]
        r_nb = jnp.concatenate([r_nb_0[None], r_nb_seq], axis=0)  # [T, K, W]

        # r_b[t] = logaddexp(r_b[t-1], r_nb[t-1]) + xb[t]
        #        -> a[t] = xb[t], b[t] = r_nb[t-1] + xb[t]
        xb_t = jnp.broadcast_to(xb[1:, None, None], (t_max - 1, k, w))
        a_b = xb_t
        b_b = r_nb[:-1] + xb_t
        ca, cb = jax.lax.associative_scan(compose, (a_b, b_b), axis=0)
        r_b_seq = jnp.logaddexp(r_b_0[None] + ca, cb)
        r_b = jnp.concatenate([r_b_0[None], r_b_seq], axis=0)

        # psi = logaddexp(psi_0, logsumexp_t(phi[t-1] + x[t])) — a reduction
        contrib = phi[:, :-1, :] + x[:, 1:, :]  # [K, T-1, W]
        psi = jnp.logaddexp(psi_0, jax.nn.logsumexp(contrib, axis=1))
        # invalid frames contribute NEG_INF via x/xb masking; beyond-length
        # rows of r are NEG_INF (vs frozen in the sequential version) — they
        # are never read because phi/x mask them on the next step too.
    else:
        def step(carry, inp):
            r_nb_prev, r_b_prev, psi = carry
            x_t, xb_s, phi_tm1, valid_t = inp  # [K,W], scalar, [K,W], bool
            r_nb_t = jnp.logaddexp(r_nb_prev, phi_tm1) + x_t
            r_b_t = jnp.logaddexp(r_b_prev, r_nb_prev) + xb_s
            psi_t = jnp.logaddexp(psi, phi_tm1 + x_t)
            # freeze state beyond the valid frames
            r_nb_t = jnp.where(valid_t, r_nb_t, r_nb_prev)
            r_b_t = jnp.where(valid_t, r_b_t, r_b_prev)
            psi_t = jnp.where(valid_t, psi_t, psi)
            return (r_nb_t, r_b_t, psi_t), (r_nb_t, r_b_t)

        xs = (
            jnp.moveaxis(x[:, 1:, :], 1, 0),  # [T-1, K, W]
            xb[1:],
            jnp.moveaxis(phi[:, :-1, :], 1, 0),  # phi[t-1]
            valid[1:],
        )
        (_, _, psi), (r_nb_seq, r_b_seq) = jax.lax.scan(
            step, (r_nb_0, r_b_0, psi_0), xs
        )
        r_nb = jnp.concatenate([r_nb_0[None], r_nb_seq], axis=0)  # [T, K, W]
        r_b = jnp.concatenate([r_b_0[None], r_b_seq], axis=0)

    # assemble [K, W, T, 2]
    r_new = jnp.stack(
        [jnp.moveaxis(r_nb, 0, 2), jnp.moveaxis(r_b, 0, 2)], axis=-1
    )  # [K, W, T, 2]

    # eos candidate: complete-sequence probability of g
    t_last = jnp.clip(length - 1, 0, t_max - 1)
    final_sum = r_prev_sum[:, t_last]  # [K]
    if eos_id >= 0:
        is_eos = cand == eos_id
        psi = jnp.where(is_eos, final_sum[:, None], psi)
    # blank is never a label of a collapsed sequence: log-zero, exactly like
    # the reference (ctc_prefix_score.py: log_psi[:, self.blank] = logzero)
    psi = jnp.where(cand == blank_id, NEG_INF, psi)
    return psi, r_new


def ctc_prefix_psi(
    logp: jnp.ndarray,  # [T, V]
    length: jnp.ndarray,  # scalar valid frames
    state: CTCPrefixState,  # beam K
    cand: jnp.ndarray,  # [K, W] candidate token ids
    blank_id: int = 0,
    eos_id: int = -1,
) -> jnp.ndarray:
    """Prefix scores psi(g.c) [K, W] WITHOUT materializing the new DP rows.

    Key identity: psi depends only on the *previous* state's rows —
    psi = logaddexp(r_nb_0, logsumexp_t(phi[t-1] + x[t])) — so scoring all
    K x W candidates is a pure reduction, no scan.  The T-length recurrence
    is only needed for the rows of hypotheses that *survive* the beam step;
    run it afterwards on the K selected extensions via ctc_prefix_advance
    (a W-fold work reduction over scoring-then-selecting, and the decode-step
    hot-path win over CTCPrefixScoreTH which always fills (T,2,K,W)).
    """
    t_max, v = logp.shape
    k, w = cand.shape
    tpos = jnp.arange(t_max)
    valid = tpos < length  # [T]

    x = jnp.take_along_axis(
        jnp.broadcast_to(logp[None], (k, t_max, v)), cand[:, None, :], axis=2
    )  # [K, T, W]
    x = jnp.where(valid[None, :, None], x, NEG_INF)

    r_prev_nb = state.r[..., 0]  # [K, T]
    r_prev_b = state.r[..., 1]
    r_prev_sum = jnp.logaddexp(r_prev_nb, r_prev_b)
    same_as_last = cand == state.last[:, None]  # [K, W]
    phi = jnp.where(
        same_as_last[:, None, :], r_prev_b[:, :, None], r_prev_sum[:, :, None]
    )  # [K, T, W]

    psi_0 = jnp.where(state.empty[:, None], x[:, 0, :], NEG_INF)  # [K, W]
    contrib = phi[:, :-1, :] + x[:, 1:, :]  # [K, T-1, W]
    psi = jnp.logaddexp(psi_0, jax.nn.logsumexp(contrib, axis=1))

    t_last = jnp.clip(length - 1, 0, t_max - 1)
    final_sum = r_prev_sum[:, t_last]  # [K]
    if eos_id >= 0:
        psi = jnp.where(cand == eos_id, final_sum[:, None], psi)
    psi = jnp.where(cand == blank_id, NEG_INF, psi)
    return psi


def ctc_prefix_advance(
    logp: jnp.ndarray,  # [T, V]
    length: jnp.ndarray,  # scalar valid frames
    state: CTCPrefixState,  # beam K (pre-selection)
    token: jnp.ndarray,  # [K'] selected candidate token per new slot
    parent: jnp.ndarray,  # [K'] parent hyp index in 0..K-1
    psi_new: jnp.ndarray,  # [K'] psi of the selected extensions
    blank_id: int = 0,
) -> CTCPrefixState:
    """Run the DP recurrence for the K' *selected* extensions only.

    Produces the same rows as ctc_prefix_scores + ctc_prefix_select for the
    chosen (parent, token) pairs, but the scan runs over [T, K'] instead of
    [T, K, W].
    """
    t_max = logp.shape[0]
    kp = token.shape[0]
    tpos = jnp.arange(t_max)
    valid = tpos < length  # [T]

    r_prev = state.r[parent]  # [K', T, 2]
    last = state.last[parent]
    empty = state.empty[parent]

    x = jnp.where(valid[None, :], logp[:, token].T, NEG_INF)  # [K', T]
    xb = jnp.where(valid, logp[:, blank_id], NEG_INF)  # [T]
    r_prev_nb = r_prev[..., 0]
    r_prev_b = r_prev[..., 1]
    same = token == last
    phi = jnp.where(same[:, None], r_prev_b, jnp.logaddexp(r_prev_nb, r_prev_b))

    r_nb_0 = jnp.where(empty, x[:, 0], NEG_INF)  # [K']
    r_b_0 = jnp.full((kp,), NEG_INF)

    def compose(f1, f2):
        a1, b1 = f1
        a2, b2 = f2
        return (a1 + a2, jnp.logaddexp(b1 + a2, b2))

    a_nb = x[:, 1:].T  # [T-1, K']
    b_nb = (phi[:, :-1] + x[:, 1:]).T
    ca, cb = jax.lax.associative_scan(compose, (a_nb, b_nb), axis=0)
    r_nb_seq = jnp.logaddexp(r_nb_0[None] + ca, cb)  # [T-1, K']
    r_nb = jnp.concatenate([r_nb_0[None], r_nb_seq], axis=0)  # [T, K']

    xb_t = jnp.broadcast_to(xb[1:, None], (t_max - 1, kp))
    b_b = r_nb[:-1] + xb_t
    ca, cb = jax.lax.associative_scan(compose, (xb_t, b_b), axis=0)
    r_b_seq = jnp.logaddexp(r_b_0[None] + ca, cb)
    r_b = jnp.concatenate([r_b_0[None], r_b_seq], axis=0)

    r = jnp.stack([r_nb.T, r_b.T], axis=-1)  # [K', T, 2]
    return CTCPrefixState(
        r=r,
        psi=psi_new,
        last=token.astype(jnp.int32),
        empty=jnp.zeros((kp,), bool),
    )


def ctc_prefix_extend(
    state: CTCPrefixState,
    logp: jnp.ndarray,  # [T, V] CTC log-softmax table (rows >= new_len unused)
    old_len: jnp.ndarray,  # scalar: frames the state was computed over
    new_len: jnp.ndarray,  # scalar: frames now available
    blank_id: int = 0,
) -> CTCPrefixState:
    """Streaming extension of alive-hypothesis DP rows over new frames.

    Matches CTCPrefixScoreTH.extend_state (ctc_prefix_score.py:244-270): only
    the blank row continues — r_b[t] = r_b[t-1] + x[t, blank] for the new
    frames; r_nb stays log-zero there (paths emitting the prefix's last label
    inside the new frames are recovered by the candidate rescoring, not the
    carried state).  psi/last/empty are unchanged (s_prev kept).
    """
    t_max = logp.shape[0]
    tpos = jnp.arange(t_max)
    ext = (tpos >= old_len) & (tpos < new_len)  # frames to fill in
    xb = jnp.where(ext, logp[:, blank_id], 0.0)
    cum = jnp.cumsum(xb)  # sum of blank logp over ext frames up to t
    base_idx = jnp.clip(old_len - 1, 0, t_max - 1)
    # old_len == 0 means no frames were processed yet: the blank-row base is
    # log(1) = 0 (the empty-path start), NOT r_b[0] — reading r_b[0] would
    # double-count frame 0's blank log-prob in the cumsum
    r_b_base = jnp.where(old_len > 0, state.r[:, base_idx, 1], 0.0)  # [K]
    r_b_ext = r_b_base[:, None] + cum[None, :]  # valid where ext
    r_nb = jnp.where(ext[None, :], NEG_INF, state.r[..., 0])
    r_b = jnp.where(ext[None, :], r_b_ext, state.r[..., 1])
    return CTCPrefixState(
        r=jnp.stack([r_nb, r_b], axis=-1),
        psi=state.psi,
        last=state.last,
        empty=state.empty,
    )


def ctc_prefix_select(
    state_r_new: jnp.ndarray,  # [K, W, T, 2]
    psi: jnp.ndarray,  # [K, W]
    cand: jnp.ndarray,  # [K, W]
    parent: jnp.ndarray,  # [K'] selected hyp index in 0..K-1
    cand_idx: jnp.ndarray,  # [K'] selected candidate index in 0..W-1
) -> CTCPrefixState:
    """Gather the DP rows of the chosen (hyp, candidate) pairs into a new state."""
    r = state_r_new[parent, cand_idx]  # [K', T, 2]
    return CTCPrefixState(
        r=r,
        psi=psi[parent, cand_idx],
        last=cand[parent, cand_idx].astype(jnp.int32),
        empty=jnp.zeros(parent.shape, bool),
    )
