"""RNN-Transducer loss as a vectorized anti-diagonal wavefront DP.

TPU-native equivalent of the warprnnt/torchaudio loss the reference's
transducer models call (espnet2/asr/espnet_model.py transducer joint and
espnet2/asr_transducer/).  The [T, U] lattice recursion

  alpha[t, u] = logaddexp(alpha[t-1, u] + blank[t-1, u],
                          alpha[t, u-1] + emit[t, u-1])

is serialized only along anti-diagonals (T+U-1 steps), each computed as one
vectorized VPU op over (batch, diagonal) — the standard wavefront trick that
maps the lattice onto SIMD hardware.  Gradients come free via autodiff
through the scan (XLA reuses the forward activations).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30


def rnnt_alpha(
    logp_blank: jnp.ndarray,  # [B, T, U+1] log P(blank | t, u)
    logp_emit: jnp.ndarray,  # [B, T, U+1] log P(y_{u+1} | t, u)
    t_lengths: jnp.ndarray,  # [B]
    u_lengths: jnp.ndarray,  # [B] label lengths (U)
) -> jnp.ndarray:
    """Forward variables; returns total log-likelihood [B].

    ll = alpha[T-1, U] + blank[T-1, U].
    """
    b, t_max, u1 = logp_blank.shape
    u_max = u1 - 1

    # diag d holds cells (t, u) with t+u = d; index by u in [0, u_max]
    n_diag = t_max + u_max + 1
    u_range = jnp.arange(u1)

    def step(alpha_prev, d):
        # alpha_prev: [B, U+1] = alpha on diagonal d-1 (cell (d-1-u, u))
        u_idx = u_range
        t_idx = d - u_idx
        on = (t_idx >= 0) & (t_idx < t_max)
        tc = jnp.clip(t_idx, 0, t_max - 1)

        # blank transition: from (t-1, u) which lies on diag d-1 at the same u
        tb = jnp.clip(t_idx - 1, 0, t_max - 1)
        blank_in = alpha_prev + logp_blank[:, tb, u_idx]
        blank_ok = on & (t_idx - 1 >= 0)

        # emit transition: from (t, u-1) on diag d-1 at u-1
        ue = jnp.maximum(u_idx - 1, 0)
        emit_in = (
            jnp.concatenate([jnp.full((alpha_prev.shape[0], 1), NEG_INF), alpha_prev[:, :-1]], axis=1)
            + logp_emit[:, tc, ue]
        )
        emit_ok = on & (u_idx - 1 >= 0)

        val = jnp.logaddexp(
            jnp.where(blank_ok, blank_in, NEG_INF),
            jnp.where(emit_ok, emit_in, NEG_INF),
        )
        # origin cell
        val = jnp.where((t_idx == 0) & (u_idx == 0), 0.0, val)
        val = jnp.where(on, val, NEG_INF)
        return val, val

    alpha0 = jnp.full((b, u1), NEG_INF)
    _, diags = jax.lax.scan(step, alpha0, jnp.arange(n_diag))
    # diags: [n_diag, B, U+1]; cell (t, u) lives at diags[t+u, :, u]
    final_d = t_lengths - 1 + u_lengths  # diag of (T-1, U)
    alpha_final = diags[final_d, jnp.arange(b), u_lengths]  # [B]
    final_blank = logp_blank[
        jnp.arange(b), jnp.clip(t_lengths - 1, 0, t_max - 1), u_lengths
    ]
    return alpha_final + final_blank


def rnnt_loss(
    logits: jnp.ndarray,  # [B, T, U+1, V] joint network outputs
    labels: jnp.ndarray,  # [B, U] (padded arbitrarily beyond length)
    t_lengths: jnp.ndarray,  # [B]
    u_lengths: jnp.ndarray,  # [B]
    blank_id: int = 0,
) -> jnp.ndarray:
    """Mean negative log-likelihood over the batch."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    logp_blank = logp[..., blank_id]  # [B, T, U+1]
    b, u_max = labels.shape
    safe_labels = jnp.clip(labels, 0, logits.shape[-1] - 1)
    # emit[t, u] = logp[t, u, labels[u]] for u < U; pad column U with -inf
    idx = jnp.broadcast_to(
        safe_labels[:, None, :, None], (b, logits.shape[1], u_max, 1)
    )
    emit = jnp.take_along_axis(logp[:, :, :u_max, :], idx, axis=-1)[..., 0]  # [B, T, U]
    emit = jnp.concatenate([emit, jnp.full((b, logits.shape[1], 1), NEG_INF)], axis=2)
    ll = rnnt_alpha(logp_blank, emit, t_lengths, u_lengths)
    return -jnp.mean(ll)


def rnnt_loss_multi_blank(
    logits: jnp.ndarray,  # [B, T, U+1, V] joint network outputs
    labels: jnp.ndarray,  # [B, U]
    t_lengths: jnp.ndarray,  # [B]
    u_lengths: jnp.ndarray,  # [B]
    blank_id: int = 0,
    big_blank_ids: Tuple[int, ...] = (),
    big_blank_durations: Tuple[int, ...] = (),
    sigma: float = 0.0,
) -> jnp.ndarray:
    """Multi-blank transducer loss (Xu et al. 2023, arXiv:2211.03541).

    Rebuild of the reference's NeMo-derived CUDA/numba kernel
    (espnet2/asr/transducer/rnnt_multi_blank/rnnt_multi_blank.py +
    utils/cuda_utils/gpu_rnnt_kernel.py:475-674) as the same anti-diagonal
    wavefront scan as ``rnnt_loss``, extended with:

    - big-blank transitions: alpha[t, u] ⊕= alpha[t-d_i, u] +
      logp(big_i | t-d_i, u) - sigma for each big blank i of duration d_i
      (the scan carries a ring of the last max(d_i) diagonals);
    - logit under-normalization: every transition weight gets ``-sigma``
      (gpu_rnnt_kernel.py:538 note);
    - final transitions through both the standard blank and every big blank
      whose duration fits (kernel :653-671).
    """
    assert len(big_blank_ids) == len(big_blank_durations)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    logp_blank = logp[..., blank_id] - sigma  # [B, T, U+1]
    b, u_max = labels.shape
    t_max = logits.shape[1]
    u1 = u_max + 1
    safe_labels = jnp.clip(labels, 0, logits.shape[-1] - 1)
    idx = jnp.broadcast_to(safe_labels[:, None, :, None], (b, t_max, u_max, 1))
    emit = jnp.take_along_axis(logp[:, :, :u_max, :], idx, axis=-1)[..., 0] - sigma
    emit = jnp.concatenate([emit, jnp.full((b, t_max, 1), NEG_INF)], axis=2)
    bigs = [logp[..., i] - sigma for i in big_blank_ids]  # each [B, T, U+1]

    durs = list(big_blank_durations)
    max_d = max([1] + durs)
    u_range = jnp.arange(u1)
    n_diag = t_max + u_max + 1

    def step(hist, d):
        # hist: [B, max_d, U+1]; hist[:, j] = diagonal d-1-j
        u_idx = u_range
        t_idx = d - u_idx
        on = (t_idx >= 0) & (t_idx < t_max)
        tc = jnp.clip(t_idx, 0, t_max - 1)
        prev = hist[:, 0]

        tb = jnp.clip(t_idx - 1, 0, t_max - 1)
        blank_in = prev + logp_blank[:, tb, u_idx]
        val = jnp.where(on & (t_idx - 1 >= 0), blank_in, NEG_INF)

        ue = jnp.maximum(u_idx - 1, 0)
        emit_in = (
            jnp.concatenate([jnp.full((b, 1), NEG_INF), prev[:, :-1]], axis=1)
            + emit[:, tc, ue]
        )
        val = jnp.logaddexp(val, jnp.where(on & (u_idx - 1 >= 0), emit_in, NEG_INF))

        for big_lp, dur in zip(bigs, durs):
            # from (t - dur, u): on diagonal d - dur = hist[:, dur - 1]
            td = jnp.clip(t_idx - dur, 0, t_max - 1)
            big_in = hist[:, dur - 1] + big_lp[:, td, u_idx]
            val = jnp.logaddexp(val, jnp.where(on & (t_idx - dur >= 0), big_in, NEG_INF))

        val = jnp.where((t_idx == 0) & (u_idx == 0), 0.0, val)
        val = jnp.where(on, val, NEG_INF)
        new_hist = jnp.concatenate([val[:, None], hist[:, :-1]], axis=1)
        return new_hist, val

    hist0 = jnp.full((b, max_d, u1), NEG_INF)
    _, diags = jax.lax.scan(step, hist0, jnp.arange(n_diag))
    # cell (t, u) lives at diags[t+u, :, u]
    bi = jnp.arange(b)
    ll = (
        diags[t_lengths - 1 + u_lengths, bi, u_lengths]
        + logp_blank[bi, jnp.clip(t_lengths - 1, 0, t_max - 1), u_lengths]
    )
    for big_i, (big_lp, dur) in enumerate(zip(bigs, durs)):
        fits = t_lengths >= dur
        t_from = jnp.clip(t_lengths - dur, 0, t_max - 1)
        cand = (
            diags[jnp.clip(t_lengths - dur + u_lengths, 0, n_diag - 1), bi, u_lengths]
            + big_lp[bi, t_from, u_lengths]
        )
        ll = jnp.logaddexp(ll, jnp.where(fits, cand, NEG_INF))
    return -jnp.mean(ll)
